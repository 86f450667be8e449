"""CLI argparse tree: every sub-command parses with reference-style flags."""

import pytest

from hichap_master_tpu.cli import build_parser


@pytest.mark.parametrize("argv", [
    ["rebuildG", "-g", "g.fa", "-S", "s.txt", "-e", "MboI", "-t", "4"],
    ["rebuildG", "-g", "g.fa", "-N"],
    ["rebuildF", "-1", "a.fq.gz", "-2", "b.fq.gz", "-c", "4000000"],
    ["GlobalMapping", "-i", "M", "P", "-m", "WS", "-wt", "16"],
    ["GlobalMapping", "-i", "IDX", "-m", "PBS", "-pt", "20", "4",
     "-mem", "10"],
    ["Rescue", "-e", "MboI", "-t", "4"],
    ["ReMapping", "-i", "M", "P", "--fake-aligner"],
    ["bamProcess", "-f", "mf.txt", "pf.txt", "-s", "s.npz", "--rfo",
     "--readlen", "100"],
    ["filtering", "-N", "-uc"],
    ["matrix", "-b", "beds", "-o", "out", "-gs", "gs", "-wR", "5000000",
     "-lR", "500000", "40000", "-ratio", "0.9", "-min", "2",
     "-region", "10000000", "-C", "#", "X"],
    ["compartment", "-c", "f.cool", "-R", "500000", "-A", "Maternal",
     "-o", "PC", "--traditional-pc", "t.txt", "--sliding"],
    ["tads", "-c", "f.cool", "-R", "40000", "-o", "T", "--state-num", "5",
     "--test-type", "chitest"],
    ["loops", "-c", "f.cool", "-R", "40000", "-o", "L",
     "--gap-file", "g.npz", "--loop-strength", "16"],
    ["specificity", "loop", "-c", "f.cool", "-R", "40000", "-i", "l.txt",
     "-o", "o.txt"],
    ["specificity", "compartment", "-R", "500000", "-i", "m.txt", "p.txt",
     "-o", "o.txt"],
])
def test_subcommands_parse(argv):
    parser = build_parser()
    args = parser.parse_args(argv + ["-w", "ws", "-r"])
    assert args.command == argv[0]
    assert args.workspace == "ws" and args.resume


def test_defaults_match_reference():
    p = build_parser()
    a = p.parse_args(["rebuildF", "-1", "a", "-2", "b"])
    assert a.chunksize == 4_000_000        # scripts/hichap:97-100
    a = p.parse_args(["matrix", "-b", "x", "-o", "o", "-gs", "g"])
    assert a.localRes == [500_000, 40_000]  # scripts/hichap:408
    assert a.ImputationRatio == 0.9 and a.ImputationMin == 2
    assert a.ImputationRegion == 10_000_000
    assert a.chroms == ["#", "X"]
    a = p.parse_args(["GlobalMapping", "-i", "I"])
    assert a.WSthreads == 16 and a.PBSthreads == [20, 4] and a.memory == 10


def test_bad_inputs_rejected():
    p = build_parser()
    with pytest.raises(SystemExit):
        p.parse_args(["GlobalMapping"])        # missing -i
    with pytest.raises(SystemExit):
        p.parse_args(["tads", "-c", "f", "-R", "40000", "-o", "T",
                      "--state-num", "4"])     # invalid state count
    with pytest.raises(SystemExit):
        p.parse_args(["compartment", "-c", "f", "-R", "x", "-o", "o"])
