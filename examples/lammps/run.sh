#!/bin/sh
# oracle side (VASP behind the socket server; see examples/vasp-cl)
python -m autoforce_tpu.calculator.calc_server -calc \
  "$(python -c 'import autoforce_tpu.calculator.vasp as v; print(v.__file__)')" &
sleep 1
# LAMMPS drives the dynamics; every step calls back into the ML model
python -m autoforce_tpu.cl.lmp -i in.lammps
