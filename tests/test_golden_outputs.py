"""Golden-output corpus (VERDICT r4 missing #3 / next #4): committed
printed-precision ``.detect``, align table, forkSense beds and seeBreaks
stats over the deterministic fixture set, diffed byte-for-byte (modulo
provenance header lines, which carry paths/timestamps).

Purpose: catch semantic drift in any pipeline immediately, and make
reference-binary bit-parity a one-session task on a weights-drop day — the
goldens then need only a one-line refresh against the real binary
(BASELINE.md protocol item 1).

Refresh after an INTENDED semantic change:

    DNASCENT_REFRESH_GOLDENS=1 python -m pytest tests/test_golden_outputs.py

then review + commit the ``tests/goldens/`` diff.
"""

import difflib
import os

import pytest

from dnascent_tpu import cli
from dnascent_tpu.testing.dataset import build_dataset

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
REFRESH = os.environ.get("DNASCENT_REFRESH_GOLDENS") == "1"

# header lines carrying run provenance (paths, wall-clock, version) — these
# legitimately vary; every semantic line is compared exactly
_PROVENANCE = ("#Alignment ", "#Genome ", "#Index ", "#SystemStartTime ",
               "#Version ", "#Threads ", "#Compute ", "#DetectFile ",
               "#ForkFiles ", "#Software ", "#Commit ")


def _normalize(text: str) -> str:
    lines = [l for l in text.splitlines()
             if not any(l.startswith(p) for p in _PROVENANCE)]
    return "\n".join(lines) + "\n"


def _check(name: str, path: str) -> None:
    got = _normalize(open(path).read())
    gold = os.path.join(GOLDEN_DIR, name)
    if REFRESH:
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        open(gold, "w").write(got)
        return
    assert os.path.exists(gold), (
        f"missing golden {name}; generate with "
        "DNASCENT_REFRESH_GOLDENS=1 pytest tests/test_golden_outputs.py")
    want = open(gold).read()
    if got != want:
        diff = "\n".join(list(difflib.unified_diff(
            want.splitlines(), got.splitlines(), fromfile=f"goldens/{name}",
            tofile="current", lineterm=""))[:40])
        raise AssertionError(
            f"{name} drifted from tests/goldens/{name}.  If the semantic "
            "change is intended, refresh with DNASCENT_REFRESH_GOLDENS=1 "
            f"and commit.  First diff hunks:\n{diff}")


@pytest.fixture(scope="module")
def dataset(tmp_path_factory, models):
    d = tmp_path_factory.mktemp("goldends")
    return build_dataset(str(d), models, n_reads=4, read_length=1500,
                         signal_format="fast5", seed=11)


def test_golden_detect(dataset, tmp_path, monkeypatch):
    monkeypatch.setenv("DNASCENT_TPU_MODELS", "/nonexistent")
    out = os.path.join(tmp_path, "out.detect")
    rc = cli.main(["detect", "-b", dataset.bam, "-r", dataset.reference_fa,
                   "-i", dataset.index, "-o", out, "-l", "1000",
                   "--allow-untrained-cnn"])
    assert rc == 0
    _check("fixture.detect", out)


def test_golden_detect_modbam(dataset, tmp_path, monkeypatch):
    """The modbam output path: full binary BAM bytes (BGZF has no
    timestamps, the writer is deterministic — verified before adding)."""
    monkeypatch.setenv("DNASCENT_TPU_MODELS", "/nonexistent")
    out = os.path.join(tmp_path, "out.bam")
    rc = cli.main(["detect", "-b", dataset.bam, "-r", dataset.reference_fa,
                   "-i", dataset.index, "-o", out, "-l", "1000",
                   "--allow-untrained-cnn"])
    assert rc == 0
    got = open(out, "rb").read()
    gold = os.path.join(GOLDEN_DIR, "fixture.detect.bam")
    if REFRESH:
        open(gold, "wb").write(got)
        return
    assert os.path.exists(gold), "missing fixture.detect.bam golden"
    want = open(gold, "rb").read()
    assert got == want, (
        "modbam bytes drifted from tests/goldens/fixture.detect.bam — "
        "refresh with DNASCENT_REFRESH_GOLDENS=1 if intended")


def test_golden_detect_hmm(dataset, tmp_path, monkeypatch):
    monkeypatch.setenv("DNASCENT_TPU_MODELS", "/nonexistent")
    out = os.path.join(tmp_path, "hmm.detect")
    rc = cli.main(["detect", "-b", dataset.bam, "-r", dataset.reference_fa,
                   "-i", dataset.index, "-o", out, "-l", "1000", "--HMM"])
    assert rc == 0
    _check("fixture.hmm.detect", out)


def test_golden_align(dataset, tmp_path, monkeypatch):
    monkeypatch.setenv("DNASCENT_TPU_MODELS", "/nonexistent")
    out = os.path.join(tmp_path, "out.align")
    rc = cli.main(["align", "-b", dataset.bam, "-r", dataset.reference_fa,
                   "-i", dataset.index, "-o", out, "-l", "100"])
    assert rc == 0
    _check("fixture.align", out)


def test_golden_align_then_traingmm(dataset, tmp_path, monkeypatch):
    """align -> trainGMM chain: the fitted 6mer model table is the
    product-level output of the GMM trainer (deterministic batched EM)."""
    monkeypatch.setenv("DNASCENT_TPU_MODELS", "/nonexistent")
    align_out = os.path.join(tmp_path, "gmm.align")
    rc = cli.main(["align", "-b", dataset.bam, "-r", dataset.reference_fa,
                   "-i", dataset.index, "-o", align_out, "-l", "100"])
    assert rc == 0
    model_out = os.path.join(tmp_path, "fit.model")
    rc = cli.main(["trainGMM", "-d", align_out, "-o", model_out,
                   "-e", "10000"])
    assert rc == 0
    _check("fixture.trainGMM.model", model_out)


def test_golden_traincnn_table(dataset, tmp_path, monkeypatch):
    """trainCNN annotated table: the double-eventalign flow with per-coord
    call columns — the one emitter path (calls-aware _process_window) the
    other goldens do not reach."""
    monkeypatch.setenv("DNASCENT_TPU_MODELS", "/nonexistent")
    out = os.path.join(tmp_path, "out.trainCNN")
    rc = cli.main(["trainCNN", "-b", dataset.bam, "-r", dataset.reference_fa,
                   "-i", dataset.index, "-o", out, "-l", "100",
                   "--allow-untrained-cnn"])
    assert rc == 0
    _check("fixture.trainCNN", out)


@pytest.fixture(scope="module")
def fork_outputs(tmp_path_factory, models):
    """forkSense + seeBreaks over the deterministic synthetic fork set (the
    same construction as test_cli_forksense_and_seebreaks, fixed seeds)."""
    from tests.test_forksense import _synthetic_read
    d = str(tmp_path_factory.mktemp("goldenfs"))
    reads = []
    for i in range(12):
        reads.append(_synthetic_read(
            seed=i, tracks=[(1000, 2200, "E"), (2300, 3500, "B")],
            read_id=f"rf-{i}"))
    for i in range(12):
        reads.append(_synthetic_read(
            seed=100 + i, tracks=[(4000, 5200, "B"), (5300, 6500, "E")],
            read_id=f"lf-{i}"))
    detect_path = os.path.join(d, "synthetic.detect")
    with open(detect_path, "w") as fh:
        fh.write("#Mode CNN\n")
        for r in reads:
            fh.write(f">{r.read_id} {r.contig} {r.ref_start} {r.ref_end} "
                     f"{r.strand}\n")
            for i in range(r.coords.shape[0]):
                fh.write(f"{r.coords[i]}\t{r.edu[i]:.6f}\t{r.brdu[i]:.6f}\n")
    cwd = os.getcwd()
    os.chdir(d)  # forkSense writes its bed set into the working directory
    try:
        rc = cli.main(["forkSense", "-d", detect_path,
                       "-o", os.path.join(d, "out.forkSense"),
                       "--order", "EdU,BrdU", "--markForks",
                       "--markAnalogues", "--markOrigins",
                       "--markTerminations"])
        assert rc == 0
        rc = cli.main(["seeBreaks",
                       "-r", os.path.join(d, "rightForks_DNAscent_forkSense.bed"),
                       "-a", os.path.join(d, "BrdU_DNAscent_forkSense.bed"),
                       "-d", detect_path,
                       "-o", os.path.join(d, "out.seeBreaks")])
        assert rc == 0
    finally:
        os.chdir(cwd)
    return d


@pytest.mark.parametrize("name", [
    "out.forkSense",
    "rightForks_DNAscent_forkSense.bed",
    "leftForks_DNAscent_forkSense.bed",
    "BrdU_DNAscent_forkSense.bed",
    "EdU_DNAscent_forkSense.bed",
    "origins_DNAscent_forkSense.bed",
    "terminations_DNAscent_forkSense.bed",
    "out.seeBreaks",
])
def test_golden_forksense_seebreaks(fork_outputs, name):
    path = os.path.join(fork_outputs, name)
    assert os.path.exists(path), name
    _check(f"fixture.{name}", path)
