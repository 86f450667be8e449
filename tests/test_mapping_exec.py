"""Mapping executors: retry-on-failure semantics (WS + mocked PBS)."""

import os
import stat
import subprocess
import sys

import pytest

from hichap_master_tpu.pipeline.mapping import (
    PBSExecutor,
    RetryingExecutor,
    Task,
)

# module-level so ProcessPoolExecutor can pickle it
def _flaky_job(flag: str, out: str) -> None:
    if os.path.exists(flag):
        with open(out, "w") as f:
            f.write("x" * 200)
    else:
        open(flag, "w").close()
        with open(out, "w") as f:
            f.write("tiny")


def test_ws_executor_retries_until_output_valid(tmp_path):
    out = str(tmp_path / "chunk0.sam")
    flag = str(tmp_path / "flag")
    ex = RetryingExecutor(workers=1, max_retries=3)
    ex.run([Task(_flaky_job, (flag, out), out)])
    assert os.path.getsize(out) >= 100


def test_ws_executor_gives_up(tmp_path):
    out = str(tmp_path / "never.sam")

    def noop():
        pass

    ex = RetryingExecutor(workers=1, max_retries=1)
    with pytest.raises(RuntimeError, match="still failing"):
        ex.run([Task(_flaky_job, (str(tmp_path / "f1"), str(tmp_path / "x")),
                     out)])


def _write_exe(path, body):
    with open(path, "w") as f:
        f.write("#!/bin/bash\n" + body + "\n")
    os.chmod(path, os.stat(path).st_mode | stat.S_IEXEC)


def test_pbs_executor_with_mock_scheduler(tmp_path):
    """Mock qsub executes the piped command synchronously; qstat reports an
    empty queue — exercises submission format, validation, resubmission."""
    qsub = str(tmp_path / "qsub")
    qstat = str(tmp_path / "qstat")
    # the reference pipes `echo "<cmd>" | qsub ...`; our mock runs stdin
    _write_exe(qsub, "sh")
    _write_exe(qstat, "echo '<Data></Data>'")

    out = str(tmp_path / "chunk0_1_Maternal.sam")
    flag = str(tmp_path / "flag")
    cmd = (f"if [ -f {flag} ]; then head -c 200 /dev/zero | tr '\\0' x > {out}; "
           f"else touch {flag}; echo tiny > {out}; fi")
    ex = PBSExecutor(num_task=2, poll_s=0.2, max_retries=3,
                     qsub=qsub, qstat=qstat)
    assert ex.available()
    ex.run_shell_tasks([(cmd, out)], "cell", threads=1,
                       log_dir=str(tmp_path))
    assert os.path.getsize(out) >= 100


def test_pbs_rescue_mapping_with_mock(tmp_path):
    from hichap_master_tpu.pipeline.mapping import pbs_rescue_mapping

    qsub = str(tmp_path / "qsub")
    qstat = str(tmp_path / "qstat")
    _write_exe(qsub, "sh")
    _write_exe(qstat, "echo '<Data></Data>'")
    rescue = tmp_path / "RescueFastq"
    rescue.mkdir()
    (rescue / "cell_chunk0_1_Maternal_unmapped.fq").write_text("@r\nACGT\n+\nIIII\n")
    (rescue / "cell_chunk0_1_Paternal_unmapped.fq").write_text("@r\nACGT\n+\nIIII\n")
    out = tmp_path / "ReMap"
    # fake bowtie2: writes a big-enough SAM to the -S target
    bowtie = str(tmp_path / "bowtie2")
    _write_exe(bowtie, 'while [ "$1" != "-S" ]; do shift; done; '
               'head -c 200 /dev/zero | tr "\\0" x > "$2"')
    outs = pbs_rescue_mapping(str(rescue), str(out),
                              {"Maternal": "Midx", "Paternal": "Pidx"},
                              cell="cell", bowtie2=bowtie,
                              qsub=qsub, qstat=qstat)
    # the mock scheduler ran each command synchronously
    assert len(outs) == 2
    for o in outs:
        assert os.path.getsize(o) >= 100


# A realistic TORQUE `qstat -x` document (structure per the Torque 6 XML
# spec: <Data> of <Job> elements, each with Job_Id/Job_Name/job_state/
# Resource_List/...), matching what the reference polls and parses
# (HiCHap/mapping.py:280-294).  The parser must count jobs by Job_Name
# substring across ALL states and ignore unrelated jobs and noise fields.
TORQUE_QSTAT_XML = """<?xml version="1.0"?>
<Data>
  <Job>
    <Job_Id>10101.master.cluster.local</Job_Id>
    <Job_Name>GM12878_mapping_chunk0</Job_Name>
    <Job_Owner>alice@master.cluster.local</Job_Owner>
    <job_state>R</job_state>
    <queue>batch</queue>
    <server>master.cluster.local</server>
    <Resource_List><mem>10gb</mem><nodect>1</nodect><nodes>1:ppn=4</nodes>
      <walltime>240:00:00</walltime></Resource_List>
    <resources_used><cput>02:13:41</cput><mem>8473644kb</mem>
      <vmem>10244232kb</vmem><walltime>02:44:02</walltime></resources_used>
    <exec_host>node07/0-3</exec_host>
  </Job>
  <Job>
    <Job_Id>10102.master.cluster.local</Job_Id>
    <Job_Name>GM12878_mapping_chunk1</Job_Name>
    <Job_Owner>alice@master.cluster.local</Job_Owner>
    <job_state>Q</job_state>
    <queue>batch</queue>
    <Resource_List><mem>10gb</mem><nodect>1</nodect><nodes>1:ppn=4</nodes>
    </Resource_List>
  </Job>
  <Job>
    <Job_Id>10103.master.cluster.local</Job_Id>
    <Job_Name>GM12878_mapping_chunk2</Job_Name>
    <job_state>C</job_state>
    <queue>batch</queue>
    <exit_status>0</exit_status>
  </Job>
  <Job>
    <Job_Id>10099.master.cluster.local</Job_Id>
    <Job_Name>somebody_elses_blast</Job_Name>
    <Job_Owner>bob@master.cluster.local</Job_Owner>
    <job_state>R</job_state>
    <queue>long</queue>
  </Job>
</Data>
"""


def test_pbs_job_count_parses_realistic_torque_xml(tmp_path):
    qstat = str(tmp_path / "qstat")
    with open(str(tmp_path / "qstat.xml"), "w") as f:
        f.write(TORQUE_QSTAT_XML)
    _write_exe(qstat, f"cat {tmp_path}/qstat.xml")
    ex = PBSExecutor(qstat=qstat)
    # all three GM12878 jobs count, regardless of R/Q/C state, like the
    # reference's PBS_Pooler; the unrelated job does not
    assert ex._job_count("GM12878_mapping") == 3
    assert ex._job_count("GM12878_mapping_chunk1") == 1
    assert ex._job_count("nonexistent") == 0


def test_pbs_job_count_tolerates_garbage_and_empty(tmp_path):
    qstat = str(tmp_path / "qstat")
    _write_exe(qstat, "echo 'qstat: Unknown queue MSG=cannot locate queue'")
    assert PBSExecutor(qstat=qstat)._job_count("x") == 0
    _write_exe(qstat, "true")
    assert PBSExecutor(qstat=qstat)._job_count("x") == 0
