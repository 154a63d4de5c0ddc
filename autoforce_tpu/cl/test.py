"""Model-only evaluation over a trajectory: writes ML predictions next to
stored targets (counterpart of theforce/cl/test.py)."""

from __future__ import annotations

from .. import cl as cline
from ..io.xyz import read_xyz, write_xyz
from ..system import SinglePointCalculator


def test(path, out_ml="test_ML.extxyz", out_fp="test_FP.extxyz"):
    calc = cline.gen_active_calc()
    calc._calc = None  # inference only
    frames = read_xyz(path)
    mode = "w"
    for s in frames:
        res = calc.calculate(s)
        ml = s.copy()
        ml.calc = SinglePointCalculator(ml, **res)
        write_xyz(out_ml, ml, mode=mode)
        if s.calc is not None:
            write_xyz(out_fp, s, mode=mode)
        mode = "a"
    return frames


def main():
    import argparse

    parser = argparse.ArgumentParser(description="Evaluate a model on a traj")
    parser.add_argument("-i", "--input", required=True)
    args = parser.parse_args()
    test(args.input)


if __name__ == "__main__":
    main()
