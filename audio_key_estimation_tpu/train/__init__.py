from .loss import compute_loss  # noqa: F401
from .metrics import mirex_score, all_key_accuracy  # noqa: F401
