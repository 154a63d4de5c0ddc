#!/bin/sh
# VASP side: a calc_server process that runs the VASP adapter
# (autoforce_tpu/calculator/vasp.py reads INCAR/KPOINTS/POTCAR from the
# working directory and the launch line from COMMAND)
python -m autoforce_tpu.calculator.calc_server -calc \
  "$(python -c 'import autoforce_tpu.calculator.vasp as v; print(v.__file__)')" &
sleep 1
# ML side: on-the-fly MLMD on the TPU host
python -m autoforce_tpu.cl.md -i POSCAR
