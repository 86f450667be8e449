from .sharding import (
    make_mesh,
    shard_chrom_batch,
    sharded_ice_balance,
    sharded_two_step,
    sharded_genomewide_correction,
    sharded_loop_escalation,
    sharded_compartment,
    analysis_train_step,
)
