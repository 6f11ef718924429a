from catnerf_tpu.models import codenerf, codes, embedding, ensemble, occupancy  # noqa: F401
from catnerf_tpu.models.embedding import (  # noqa: F401
    EMB_SIZE1,
    EMB_SIZE2,
    EMB_SIZE_TOTAL,
)
