from .genome import (
    Genome,
    chrom_check,
    sort_chromosomes,
    strip_chr,
)
from .contacts import ContactBatch, pad_to_bucket, bucket_groups
