"""Greedy inducing-set compression by force R2
(counterpart of theforce/cl/shrink.py)."""

from __future__ import annotations

from .. import cl as cline
from ..regression.compress import shrink


def main():
    import argparse

    parser = argparse.ArgumentParser(description="Shrink the inducing set")
    parser.add_argument("-m", "--target", type=int, required=True)
    parser.add_argument("-c", "--candidates", type=int, default=None)
    args = parser.parse_args()
    calc = cline.gen_active_calc()
    shrink(calc.model, args.target, candidates=args.candidates, verbose=True)
    calc.save_model()


if __name__ == "__main__":
    main()
