"""Offline training: ``python -m autoforce_tpu.cl.train -i data.extxyz``
or ``-i model.sgpr`` (counterpart of theforce/cl/train.py)."""

from __future__ import annotations

from .. import cl as cline


def train(inputs):
    calc = cline.gen_active_calc()
    for path in inputs:
        if path.endswith(".sgpr"):
            calc.include_tape(path)
        else:
            from ..io.xyz import read_xyz

            calc.include_data(read_xyz(path))
    calc.save_model()
    return calc


def main():
    import argparse

    parser = argparse.ArgumentParser(description="Offline SGPR training")
    parser.add_argument("-i", "--input", nargs="+", required=True)
    args = parser.parse_args()
    train(args.input)


if __name__ == "__main__":
    main()
