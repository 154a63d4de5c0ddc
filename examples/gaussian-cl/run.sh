#!/bin/sh
# Gaussian side: calc_server wrapping the Gaussian adapter (writes calc.gjf
# from template.gjf, runs $GAUSSIAN_COMMAND, parses energy/forces)
python -m autoforce_tpu.calculator.calc_server -calc \
  "$(python -c 'import autoforce_tpu.calculator.gaussian as g; print(g.__file__)')" &
sleep 1
# ML side
python -m autoforce_tpu.cl.md -i molecule.xyz
