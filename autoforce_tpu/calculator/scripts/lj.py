"""Oracle script: Lennard-Jones."""
from autoforce_tpu.calculator.oracles import LennardJones

calc = LennardJones()
