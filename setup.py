"""Package installation (reference ships setup.py with CUDA extension
builds, setup.py:225-317; here the only native piece is the optional
C++ loader library, built lazily by make or on first use)."""
from setuptools import find_packages, setup

setup(
    name="distillbev-tpu",
    version="0.1.0",
    description=("TPU-native cross-modal BEV distillation framework "
                 "(DistillBEV capabilities on JAX/XLA/Pallas)"),
    packages=find_packages(exclude=("tests", "tools", "configs")),
    package_data={"distillbev_tpu.native": ["src/*.cc", "Makefile"]},
    python_requires=">=3.10",
    install_requires=[
        "jax", "flax", "optax", "orbax-checkpoint", "chex", "einops",
        "numpy", "pillow",
    ],
)
