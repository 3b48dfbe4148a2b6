"""AISHELL3 adapter (aishell_pre.py:9-23 parity) on a fabricated layout."""
import os

from diff_vits_tpu.data.aishell import prepare


def test_prepare_copies_wavs_and_writes_transcripts(tmp_path):
    root = tmp_path / "AISHELL3"
    wav_dir = root / "train" / "wav" / "SSB0005"
    wav_dir.mkdir(parents=True)
    (wav_dir / "SSB00050001.wav").write_bytes(b"RIFFfake")
    (wav_dir / "SSB00050002.wav").write_bytes(b"RIFFfake2")
    (wav_dir / "SSB00050003.wav").write_bytes(b"RIFForphan")  # no label
    (root / "train" / "label_train-set.txt").write_text(
        "# header comment\n"
        "SSB00050001|guo2 ji4|国际\n"
        "SSB00050002|ni3 hao3|你好\n",
        encoding="utf-8")

    out = tmp_path / "out"
    prepare(str(root), str(out))

    assert (out / "SSB00050001.wav").read_bytes() == b"RIFFfake"
    assert (out / "SSB00050001.txt").read_text(
        encoding="utf-8").strip() == "国际"
    assert (out / "SSB00050002.txt").read_text(
        encoding="utf-8").strip() == "你好"
    # wav without a transcript line is skipped, not half-copied
    copied = sorted(os.listdir(out))
    assert "SSB00050003.wav" not in copied
    assert "SSB00050003.txt" not in copied
