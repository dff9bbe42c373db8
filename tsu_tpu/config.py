"""Exception hierarchy and validated, immutable configuration dataclasses.

Mirrors the reference's config surface (tsu/core.py:12-51, tsu/gibbs.py:19-36,
tsu/models/ising.py:25-36) with one deliberate change: configs here are
**frozen**. The reference mutates configs at runtime to implement annealing and
temperature sweeps (tsu/gibbs.py:381-382, tsu/models/ising.py:491-499 — quirk
Q8 in SURVEY.md); in a traced/jitted world temperature is a *traced argument*
instead, so sweeps and annealing stay functional and compile once.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass


class TSUError(Exception):
    """Base exception for all tsu_tpu errors (cf. tsu/core.py:12-15)."""


class ConfigurationError(TSUError):
    """Invalid configuration parameters (cf. tsu/core.py:18-21)."""


class SamplingError(TSUError):
    """Errors raised during sampling (cf. tsu/core.py:24-27)."""


def _require(cond: bool, msg: str):
    if not cond:
        raise ConfigurationError(msg)


@dataclass(frozen=True)
class TSUConfig:
    """Configuration for the Langevin sampling engine (cf. tsu/core.py:30-51).

    Attributes:
        temperature: sampling temperature T > 0.
        dt: integrator step size, 0 < dt <= 0.1 (reference bound, tsu/core.py:44-45).
        friction: Langevin friction coefficient gamma > 0.
        n_burnin: burn-in steps discarded before the first sample.
        n_steps: integration steps between retained samples.
        n_chains: independent chains run in parallel (vmapped; new capability —
            the reference loops chains sequentially).
        underdamped: use the underdamped (BAOAB leapfrog) integrator; if False,
            overdamped Euler-Maruyama matching the reference dynamics
            (tsu/core.py:64-80).
        mass: particle mass for the underdamped integrator.
    """

    temperature: float = 1.0
    dt: float = 0.01
    friction: float = 1.0
    n_burnin: int = 100
    n_steps: int = 1000
    n_chains: int = 1
    underdamped: bool = True
    mass: float = 1.0

    def __post_init__(self):
        _require(self.temperature > 0, f"temperature must be positive, got {self.temperature}")
        _require(0 < self.dt <= 0.1, f"dt must be in (0, 0.1], got {self.dt}")
        _require(self.friction > 0, f"friction must be positive, got {self.friction}")
        _require(self.n_burnin >= 0, f"n_burnin must be non-negative, got {self.n_burnin}")
        _require(self.n_steps > 0, f"n_steps must be positive, got {self.n_steps}")
        _require(self.n_chains > 0, f"n_chains must be positive, got {self.n_chains}")
        _require(self.mass > 0, f"mass must be positive, got {self.mass}")

    def replace(self, **kwargs) -> "TSUConfig":
        """Return a copy with fields replaced (configs are immutable)."""
        return dataclasses.replace(self, **kwargs)


@dataclass(frozen=True)
class GibbsConfig:
    """Configuration for Gibbs sampling (cf. tsu/gibbs.py:19-36).

    Attributes:
        temperature: sampling temperature T > 0.
        n_burnin: burn-in sweeps before the first retained sample.
        n_sweeps: sweeps between retained samples (thinning).
        update_order: "checkerboard" (default — graph-colored block sweeps,
            the TPU-native fast path; same invariant distribution as the
            reference's chain), "sequential" (true site-ordered scan, the
            exact Markov chain of the reference, tsu/gibbs.py:153-158;
            orders of magnitude slower at scale — opt in only when chain
            semantics must match bit-for-bit), or "random" (site order
            re-permuted every sweep, tsu/gibbs.py:155-156). The reference's
            default is "sequential"; defaulting to the colored engine here
            is deliberate — a default config must not carry a silent
            throughput cliff, and all orders target the same distribution.
        n_chains: independent chains run in parallel.
    """

    temperature: float = 1.0
    n_burnin: int = 100
    n_sweeps: int = 10
    update_order: str = "checkerboard"
    n_chains: int = 1

    def __post_init__(self):
        _require(self.temperature > 0, f"temperature must be positive, got {self.temperature}")
        _require(self.n_burnin >= 0, f"n_burnin must be non-negative, got {self.n_burnin}")
        _require(self.n_sweeps > 0, f"n_sweeps must be positive, got {self.n_sweeps}")
        _require(
            self.update_order in ("checkerboard", "sequential", "random"),
            "update_order must be 'checkerboard', 'sequential' or "
            f"'random', got {self.update_order!r}",
        )
        _require(self.n_chains > 0, f"n_chains must be positive, got {self.n_chains}")

    def replace(self, **kwargs) -> "GibbsConfig":
        return dataclasses.replace(self, **kwargs)


@dataclass(frozen=True)
class IsingConfig:
    """Configuration for Ising model sampling (cf. tsu/models/ising.py:25-36)."""

    temperature: float = 1.0
    n_burnin: int = 100
    n_sweeps: int = 10
    coupling_strength: float = 1.0
    n_chains: int = 1

    def __post_init__(self):
        _require(self.temperature > 0, f"temperature must be positive, got {self.temperature}")
        _require(self.n_burnin >= 0, f"n_burnin must be non-negative, got {self.n_burnin}")
        _require(self.n_sweeps > 0, f"n_sweeps must be positive, got {self.n_sweeps}")
        _require(self.n_chains > 0, f"n_chains must be positive, got {self.n_chains}")

    def replace(self, **kwargs) -> "IsingConfig":
        return dataclasses.replace(self, **kwargs)
