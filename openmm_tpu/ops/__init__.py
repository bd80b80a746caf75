"""openmm_tpu.ops — the JAX/XLA/Pallas compute path (forces, integrators,
neighbor lists, PME, constraints, virtual sites)."""
