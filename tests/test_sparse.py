"""Sparse-Ising (ELL) and native graph-tool tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tsu_tpu.ops.sparse_ising import (
    ell_energy,
    ell_from_edges,
    ell_local_fields,
    maxcut_sparse,
)


def ring_graph(n):
    edges = np.array([(i, (i + 1) % n) for i in range(n)])
    return edges, np.ones(n)


class TestELL:
    def test_local_fields_match_dense(self, rng):
        n = 12
        edges = np.array([(i, j) for i in range(n) for j in range(i + 1, n)
                          if rng.random() < 0.4])
        w = rng.normal(0, 1, len(edges))
        idx, ew = ell_from_edges(n, edges, w)
        J = np.zeros((n, n))
        for (u, v), wij in zip(edges, w):
            J[u, v] = J[v, u] = wij
        s = np.where(rng.random(n) < 0.5, 1.0, -1.0)
        h = rng.normal(0, 1, n)
        fields = np.asarray(ell_local_fields(jnp.asarray(s, dtype=jnp.float32),
                                             jnp.asarray(idx), jnp.asarray(ew),
                                             jnp.asarray(h, dtype=jnp.float32)))
        np.testing.assert_allclose(fields, J @ s + h, rtol=1e-5, atol=1e-5)

    def test_energy_matches_dense(self, rng):
        n = 10
        edges = np.array([(i, (i + 1) % n) for i in range(n)])
        w = rng.normal(0, 1, n)
        idx, ew = ell_from_edges(n, edges, w)
        J = np.zeros((n, n))
        for (u, v), wij in zip(edges, w):
            J[u, v] = J[v, u] = wij
        s = np.where(rng.random(n) < 0.5, 1.0, -1.0)
        e = float(ell_energy(jnp.asarray(s, dtype=jnp.float32),
                             jnp.asarray(idx), jnp.asarray(ew),
                             jnp.zeros(n)))
        assert e == pytest.approx(-0.5 * s @ J @ s, rel=1e-5)

    def test_padding_is_inert(self):
        # Node 0 has degree 1, node 1 degree 2 -> padding must not leak.
        edges = np.array([(0, 1), (1, 2)])
        idx, ew = ell_from_edges(3, edges, np.array([1.0, 1.0]))
        s = jnp.asarray([1.0, 1.0, -1.0])
        f = np.asarray(ell_local_fields(s, jnp.asarray(idx), jnp.asarray(ew),
                                        jnp.zeros(3)))
        np.testing.assert_allclose(f, [1.0, 0.0, 1.0])


class TestSparseMaxCut:
    def test_bipartite_exact(self):
        # Even ring: perfect cut = n (alternating spins).
        n = 16
        edges, w = ring_graph(n)
        out = maxcut_sparse(jax.random.key(0), n, edges, w,
                            n_steps=400, n_chains=4)
        assert out["cut_value"] == pytest.approx(n)

    def test_k33(self):
        edges = np.array([(i, j) for i in range(3) for j in range(3, 6)])
        out = maxcut_sparse(jax.random.key(1), 6, edges, np.ones(9),
                            n_steps=300, n_chains=4)
        assert out["cut_value"] == pytest.approx(9.0)

    @pytest.mark.slow
    def test_large_graph_beats_random(self, rng):
        n = 5000
        m = 20000
        e = rng.integers(0, n, (m, 2))
        e = e[e[:, 0] != e[:, 1]]
        w = np.ones(len(e))
        out = maxcut_sparse(jax.random.key(2), n, e, w, n_steps=500,
                            n_chains=4)
        # Random assignment cuts ~50%; annealing must do clearly better.
        assert out["cut_value"] > 0.6 * len(e)


class TestNative:
    def test_greedy_k33(self):
        from tsu_tpu.native import csr_from_dense, cut_value_csr, greedy_maxcut_csr

        W = np.zeros((6, 6))
        for i in range(3):
            for j in range(3, 6):
                W[i, j] = W[j, i] = 1.0
        indptr, idx, w = csr_from_dense(W)
        cut, spins = greedy_maxcut_csr(indptr, idx, w, n_restarts=4, seed=0)
        assert cut == pytest.approx(9.0)
        assert cut_value_csr(indptr, idx, w, spins) == pytest.approx(9.0)

    def test_conflicts(self):
        from tsu_tpu.native import coloring_conflicts_csr, csr_from_edges

        edges = np.array([(0, 1), (1, 2), (2, 0)])  # triangle
        indptr, idx, _ = csr_from_edges(3, edges, np.ones(3))
        assert coloring_conflicts_csr(indptr, idx,
                                      np.array([0, 0, 0], np.int32)) == 3
        assert coloring_conflicts_csr(indptr, idx,
                                      np.array([0, 1, 2], np.int32)) == 0

    def test_matches_python_fallback(self, rng):
        from tsu_tpu import native

        n = 50
        e = np.array([(i, j) for i in range(n) for j in range(i + 1, n)
                      if rng.random() < 0.2])
        indptr, idx, w = native.csr_from_edges(n, e, np.ones(len(e)))
        spins = np.where(rng.random(n) < 0.5, 1.0, -1.0)
        got = native.cut_value_csr(indptr, idx, w, spins)
        # Independent dense computation.
        W = np.zeros((n, n))
        for (u, v) in e:
            W[u, v] = W[v, u] = 1.0
        exp = 0.25 * float(np.sum(W * (1 - np.outer(spins, spins))))
        assert got == pytest.approx(exp)


class TestNativeSA:
    """Native C++ sa_dense: the small-problem latency path
    (tsu_tpu/native/graph_tools.cpp, routed by
    samplers/annealing.simulated_annealing_dense on integer seeds)."""

    def test_native_finds_ferromagnet_ground_state(self):
        from tsu_tpu.native import native_available, sa_dense_native

        if not native_available():
            pytest.skip("native library unavailable")
        n = 10
        J = np.zeros((n, n), np.float32)
        for i in range(n - 1):
            J[i, i + 1] = J[i + 1, i] = 2.0
        schedule = np.geomspace(5.0, 0.05, 400).astype(np.float32)
        state, e = sa_dense_native(J, np.zeros(n, np.float32), schedule,
                                   n_chains=8, seed=3)
        # Bit-ferromagnet ground state: all ones, E = -(n-1)*2.
        assert np.all(state == 1.0)
        assert e == pytest.approx(-(n - 1) * 2.0)

    def test_native_matches_enumeration_optimum(self, rng):
        from tsu_tpu.native import native_available, sa_dense_native

        if not native_available():
            pytest.skip("native library unavailable")
        n = 8
        J = rng.normal(0, 1.0, (n, n)).astype(np.float32)
        J = (J + J.T) / 2
        np.fill_diagonal(J, 0.0)
        h = rng.normal(0, 0.5, n).astype(np.float32)
        # Exact minimum by enumeration.
        import itertools

        best = 1e30
        for bits in itertools.product([0.0, 1.0], repeat=n):
            b = np.asarray(bits, np.float32)
            best = min(best, float(-0.5 * b @ J @ b - h @ b))
        schedule = np.geomspace(5.0, 0.02, 1500).astype(np.float32)
        state, e = sa_dense_native(J, h, schedule, n_chains=16, seed=7)
        assert e == pytest.approx(best, abs=1e-4)
        # Reported energy must equal the energy of the reported state.
        b = np.asarray(state, np.float32)
        assert e == pytest.approx(float(-0.5 * b @ J @ b - h @ b), abs=1e-3)

    def test_routing_prefers_native_for_int_seed(self):
        """simulated_annealing_dense with an int seed on a small problem
        returns HOST arrays (no device round-trip)."""
        from tsu_tpu.native import native_available
        from tsu_tpu.samplers.annealing import simulated_annealing_dense

        if not native_available():
            pytest.skip("native library unavailable")
        J = np.zeros((4, 4), np.float32)
        J[0, 1] = J[1, 0] = 1.0
        state, e = simulated_annealing_dense(5, J, np.zeros(4, np.float32),
                                             n_steps=100, n_chains=2)
        assert isinstance(state, np.ndarray)
        assert state.shape == (4,)


class TestNativeGibbs:
    """Native C++ gibbs_dense: tiny-model latency path routed by
    GibbsSampler.sample_boltzmann."""

    def test_matches_enumerated_distribution(self, rng):
        from tsu_tpu.native import gibbs_dense_native, native_available

        if not native_available():
            pytest.skip("native library unavailable")
        from tsu_tpu.benchmarks.sampling import (
            _exact_distribution,
            _state_histogram,
        )

        n = 5
        J = rng.normal(0, 0.5, (n, n)).astype(np.float32)
        J = (J + J.T) / 2
        np.fill_diagonal(J, 0.0)
        h = rng.normal(0, 0.3, n).astype(np.float32)
        out = gibbs_dense_native(J, h, temperature=1.0, n_chains=16,
                                 n_samples=20000, n_burnin=100, n_sweeps=2,
                                 random_order=False, seed=9)
        assert out.shape == (20000, n)
        emp = _state_histogram(out)
        exact = _exact_distribution(J, h, 1.0)
        assert np.abs(emp - exact).max() < 0.01

    def test_sampler_routes_small_problems_to_host(self):
        from tsu_tpu.native import native_available
        from tsu_tpu import GibbsConfig, GibbsSampler

        if not native_available():
            pytest.skip("native library unavailable")
        J = np.zeros((6, 6), np.float32)
        for i in range(5):
            J[i, i + 1] = J[i + 1, i] = 1.0
        s = GibbsSampler(GibbsConfig(n_burnin=20, n_sweeps=1, n_chains=4),
                         seed=0)
        out = s.sample_boltzmann(J, n_samples=50)
        assert out.shape == (50, 6)
        assert set(np.unique(out)) <= {0.0, 1.0}


class TestSparseAnnealResume:
    def test_chunked_matches_single_chunk(self):
        import numpy as np

        from tsu_tpu.ops.sparse_ising import ell_from_edges, sparse_anneal

        rng = np.random.default_rng(0)
        edges = rng.integers(0, 50, (200, 2))
        edges = edges[edges[:, 0] != edges[:, 1]]
        idx, w = ell_from_edges(50, edges, np.ones(len(edges)))
        sched = np.geomspace(3.0, 0.1, 60).astype(np.float32)
        args = (jax.random.key(3), jnp.asarray(idx), jnp.asarray(-w),
                jnp.zeros(50), sched)
        s1, e1 = sparse_anneal(*args, n_steps=60, n_chains=4)
        s2, e2 = sparse_anneal(*args, n_steps=60, n_chains=4, chunk_steps=17)
        assert float(e1) == float(e2)
        assert np.array_equal(np.asarray(s1), np.asarray(s2))

    def test_killed_and_resumed_matches(self, tmp_path, monkeypatch):
        import numpy as np

        import tsu_tpu.checkpoint as ckpt_mod
        from tsu_tpu.ops.sparse_ising import ell_from_edges, sparse_anneal

        rng = np.random.default_rng(1)
        edges = rng.integers(0, 40, (150, 2))
        edges = edges[edges[:, 0] != edges[:, 1]]
        idx, w = ell_from_edges(40, edges, np.ones(len(edges)))
        sched = np.geomspace(3.0, 0.1, 60).astype(np.float32)
        args = (jax.random.key(5), jnp.asarray(idx), jnp.asarray(-w),
                jnp.zeros(40), sched)
        full_s, full_e = sparse_anneal(*args, n_steps=60, n_chains=4)

        real_save = ckpt_mod.save_state
        calls = {"n": 0}

        def dying_save(path, state, step=None):
            out = real_save(path, state, step)
            calls["n"] += 1
            if calls["n"] == 2:
                raise RuntimeError("simulated preemption")
            return out

        monkeypatch.setattr(ckpt_mod, "save_state", dying_save)
        p = str(tmp_path / "sa_ck")
        with pytest.raises(RuntimeError, match="preemption"):
            sparse_anneal(*args, n_steps=60, n_chains=4, chunk_steps=15,
                          checkpoint_path=p)
        monkeypatch.setattr(ckpt_mod, "save_state", real_save)
        res_s, res_e = sparse_anneal(*args, n_steps=60, n_chains=4,
                                     chunk_steps=15, checkpoint_path=p,
                                     resume=True)
        assert float(res_e) == float(full_e)
        assert np.array_equal(np.asarray(res_s), np.asarray(full_s))
