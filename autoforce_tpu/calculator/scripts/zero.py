"""Oracle script: zeros ('Only for quick tests!', theforce/calculator/zero.py)."""
from autoforce_tpu.calculator.oracles import ZeroCalculator

calc = ZeroCalculator()
