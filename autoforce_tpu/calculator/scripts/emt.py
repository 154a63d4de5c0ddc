"""Oracle script: EMT (role of theforce/calculator/emt.py)."""
from autoforce_tpu.calculator.emt import EMT

calc = EMT()
