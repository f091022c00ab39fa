"""IO: trajectory writers, evaluation, serialization."""

from .evaluation import align_horn, ate_rmse  # noqa: F401
from .trajectory import save_tum, load_tum  # noqa: F401
