"""Replicate merging: Merged_* outputs must equal the sum of replicates."""

import numpy as np
import pytest

from hichap_master_tpu.core import Genome
from hichap_master_tpu.io import CoolerReader
from hichap_master_tpu.pipeline.matrix import (
    haplotype_matrix_construction,
    traditional_matrix_construction,
)
from hichap_master_tpu.testing.synthetic import (
    random_contacts,
    write_allelic_beds,
    write_valid_bed,
)


@pytest.fixture
def genome():
    return Genome({"1": 600_000, "2": 400_000})


def test_traditional_two_replicates(tmp_path, rng, genome):
    genome.write(tmp_path / "genomeSize")
    reps = []
    contacts = []
    for i in (1, 2):
        rep = tmp_path / f"rep{i}"
        rep.mkdir()
        c = random_contacts(rng, genome, 1500)
        contacts.append(c)
        write_valid_bed(str(rep / f"Cell_R{i}_Valid.bed"), genome, *c, rng)
        reps.append(str(rep))

    out = traditional_matrix_construction(
        str(tmp_path), reps, str(tmp_path / "genomeSize"),
        whole_res=[], local_res=[50_000], balance=False)
    r1 = CoolerReader(out["coolers"][0], 50_000)
    r2 = CoolerReader(out["coolers"][1], 50_000)
    rm = CoolerReader(out["merged"], 50_000)
    for c in genome.labels:
        np.testing.assert_array_equal(
            rm.matrix(c), r1.matrix(c) + r2.matrix(c))


def test_haplotype_two_replicates_merged(tmp_path, rng, genome):
    genome.write(tmp_path / "genomeSize")
    reps = []
    for i in (1, 2):
        rep = tmp_path / f"beds{i}"
        write_allelic_beds(str(rep), f"Cell_R{i}_", genome, rng, n=800)
        reps.append(str(rep))
    out = haplotype_matrix_construction(
        str(tmp_path), reps, str(tmp_path / "genomeSize"),
        whole_res=[100_000], local_res=[50_000], imputation_region=300_000)
    assert "Merged_" in out
    files = out["Merged_"]
    ru = CoolerReader(files["unimputated"], 100_000)
    u1 = CoolerReader(out["Cell_R1_"]["unimputated"], 100_000)
    u2 = CoolerReader(out["Cell_R2_"]["unimputated"], 100_000)
    for c in ("M1", "P2"):
        np.testing.assert_array_equal(
            ru.matrix(c), u1.matrix(c) + u2.matrix(c))
    # merged corrected output exists and is finite
    ri = CoolerReader(files["imputated"], 50_000)
    assert np.isfinite(ri.matrix("M1")).all()
    gaps = np.load(files["gap"], allow_pickle=True)
    assert "50000" in gaps
