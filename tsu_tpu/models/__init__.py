"""Domain models: Ising systems and Bayesian neural networks."""
