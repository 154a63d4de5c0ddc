#!/bin/sh
# start the 'DFT' side (here: the EMT oracle script) — counterpart of the
# reference's server example; the ML process connects via ARGS calculator
python -m autoforce_tpu.calculator.calc_server -calc \
  "$(python -c 'import autoforce_tpu.calculator.scripts as s, os; print(os.path.join(os.path.dirname(s.__file__), "emt.py"))')"
