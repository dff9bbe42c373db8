"""Samplers: Langevin, Gibbs (dense + checkerboard lattice), HMC, parallel
tempering, simulated annealing, annealed SMC, and variational inference.

All samplers follow the same functional shape: pure ``init`` / ``step``
functions composed into ``lax.scan`` loops, jitted once, vmapped over chains,
and shardable over device meshes (tsu_tpu/parallel/).
"""

from tsu_tpu.samplers.langevin import sample_langevin, make_langevin_step
from tsu_tpu.samplers.gibbs import GibbsSampler, dense_gibbs_sample
from tsu_tpu.samplers.hmc import sample_hmc, sample_hmc_adaptive
from tsu_tpu.samplers.mala import sample_mala
from tsu_tpu.samplers.tempering import (
    parallel_tempering_bonds,
    parallel_tempering_dense,
    parallel_tempering_lattice,
)
from tsu_tpu.samplers.tempering_ladder import (
    build_tempering_ladder,
    houdayer_move,
    pt_ground_state_search,
)
from tsu_tpu.samplers.annealing import simulated_annealing_dense, anneal_lattice
from tsu_tpu.samplers.nuts import sample_nuts
from tsu_tpu.samplers.smc import annealed_smc
from tsu_tpu.samplers.vi import fit_meanfield_vi

__all__ = [
    "sample_langevin",
    "make_langevin_step",
    "GibbsSampler",
    "dense_gibbs_sample",
    "sample_hmc",
    "sample_hmc_adaptive",
    "sample_mala",
    "sample_nuts",
    "build_tempering_ladder",
    "houdayer_move",
    "parallel_tempering_bonds",
    "parallel_tempering_dense",
    "parallel_tempering_lattice",
    "pt_ground_state_search",
    "simulated_annealing_dense",
    "anneal_lattice",
    "annealed_smc",
    "fit_meanfield_vi",
]
