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
