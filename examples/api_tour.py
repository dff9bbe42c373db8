"""Tour of the public API surface (the reference's examples/API_test.py
capability): functional samplers, OO samplers with metadata, optimization,
probabilistic models, Ising grids — each exercised end to end.

Run: python examples/api_tour.py
"""

import numpy as np

import tsu_tpu


def main():
    print(f"[OK] tsu_tpu {tsu_tpu.__version__}, "
          f"{len(tsu_tpu.__all__)} public symbols")

    # 1. Functional API.
    s = tsu_tpu.sample_gaussian(mu=0.0, sigma=1.0, n=500)
    print(f"1. sample_gaussian: mean={np.mean(s):.3f} std={np.std(s):.3f}")

    # 2. OO API with timing metadata.
    sampler = tsu_tpu.GaussianSampler(mu=5.0, sigma=2.0, seed=0)
    result = sampler.sample(500)
    assert isinstance(result, tsu_tpu.SamplingResult)
    print(f"2. GaussianSampler: mean={np.mean(result.samples):.3f} "
          f"({result.metadata['samples_per_second']:.0f} samples/s on "
          f"{result.metadata['device']})")

    # 3. Multimodal sampling.
    m = tsu_tpu.sample_multimodal(modes=[-3.0, 3.0], sigmas=[0.5, 0.5], n=500)
    frac_left = float(np.mean(m < 0))
    print(f"3. sample_multimodal: {frac_left:.0%} in the left mode")

    # 4. Optimization: MAX-CUT via annealed sampling.
    rng = np.random.default_rng(0)
    n = 12
    adj = (rng.random((n, n)) < 0.4).astype(float)
    adj = np.triu(adj, 1) + np.triu(adj, 1).T
    problem = tsu_tpu.MaxCutProblem(adj)
    res = tsu_tpu.optimize(problem, n_steps=300, seed=0)
    print(f"4. MAX-CUT (n={n}): cut value {-res['best_objective']:.0f} of "
          f"{int(adj.sum() / 2)} edges in {res['time_elapsed']:.2f}s")

    # 5. Probabilistic model (Keras-style).
    model = tsu_tpu.ProbabilisticModel()
    model.add(tsu_tpu.StochasticLinear(4, 3, weight_noise=0.1, seed=0))
    model.add(tsu_tpu.BernoulliActivation(seed=1))
    out = model.forward(np.ones((2, 4)))
    print(f"5. ProbabilisticModel forward: shape {out.shape}, "
          f"values in {sorted(set(np.unique(out)))}")

    # 6. Ising grid with observables.
    grid = tsu_tpu.IsingGrid((16, 16), coupling_strength=1.0, periodic=True)
    states = grid.sample(n_samples=30, temperature=1.5)
    print(f"6. IsingGrid 16x16 @T=1.5: |M|={abs(grid.magnetization(states)):.2f}")

    print("[OK] API tour complete")


if __name__ == "__main__":
    main()
