"""Rebuild model.pckl from the .sgpr tape including ALL entries
(counterpart of theforce/cl/build.py)."""

from .. import cl as cline


def main():
    calc = cline.gen_active_calc()
    calc.build()


if __name__ == "__main__":
    main()
