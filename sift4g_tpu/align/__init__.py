from .records import AlignmentRecord, MOVE_DIAG, MOVE_LEFT, MOVE_UP  # noqa: F401
from .dp_numpy import align_pair, score_pair  # noqa: F401
