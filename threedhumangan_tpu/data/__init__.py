"""Data pipeline: datasets, device-side preprocessor, ADA augmentation.

Mirrors reference layer L4 (SURVEY.md §1): lib/data/.
"""

from threedhumangan_tpu.data.dataset import (
    SHHQDataset,
    SyntheticSHHQDataset,
    get_dataset,
    get_dataset_distributed,
    iterate_batches,
    make_dataset,
    preprocess_smpl_fix_body,
)
from threedhumangan_tpu.data.preprocessor import Preprocessor, get_preprocessor
