"""Robust kernels and chi-square thresholds.

Reference semantics: g2o RobustKernelHuber (3rdparty/g2o/g2o/core/
robust_kernel_impl.cpp) with the deltas the reference uses everywhere:
sqrt(5.991) for 2-dof monocular reprojection and sqrt(7.815) for 3-dof
stereo residuals (e.g. src/solver/g2o_solver/optimizer.cc:118,151).
"""

import jax.numpy as jnp

# 95% chi-square quantiles used as both Huber deltas (squared) and
# outlier-classification thresholds in the reference.
CHI2_2D = 5.991
CHI2_3D = 7.815


def huber_weight(chi2: jnp.ndarray, delta2: float) -> jnp.ndarray:
    """IRLS weight for the Huber loss given squared error chi2.

    rho(e) = e                     if e <= delta^2
           = 2 delta sqrt(e) - delta^2  otherwise
    weight = rho'(e) = min(1, delta / sqrt(e)).
    """
    delta = jnp.sqrt(jnp.asarray(delta2, dtype=chi2.dtype))
    sqrt_e = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    return jnp.minimum(1.0, delta / sqrt_e)


def huber_rho(chi2: jnp.ndarray, delta2: float) -> jnp.ndarray:
    """Huber loss value given squared error (for LM cost comparison)."""
    delta = jnp.sqrt(jnp.asarray(delta2, dtype=chi2.dtype))
    sqrt_e = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    return jnp.where(chi2 <= delta2, chi2, 2.0 * delta * sqrt_e - delta2)
