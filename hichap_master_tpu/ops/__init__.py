from .masked import masked_percentile, masked_mean, masked_var, masked_median
from .correct import (
    coverage,
    gap_mask,
    gap_mask_lowres,
    trans2symmetry,
    correct_vc,
    two_step_correction,
    two_step_correction_batch,
)
from .balance import ice_balance, ice_balance_batch
