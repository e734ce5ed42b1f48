from variational_mmt_tpu.data.vocab import Vocab, PAD, UNK, BOS, EOS  # noqa: F401
from variational_mmt_tpu.data.dataset import (  # noqa: F401
    Batch,
    BinarizedDataset,
    BucketIterator,
    binarize,
)
