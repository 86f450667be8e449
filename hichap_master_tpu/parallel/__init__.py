from .sharding import (
    make_mesh,
    shard_chrom_batch,
    sharded_ice_balance,
    sharded_two_step,
    sharded_genomewide_correction,
    sharded_sparse_ice,
    sharded_sparse_genomewide,
    sharded_loop_escalation,
    sharded_compartment,
    analysis_train_step,
)
