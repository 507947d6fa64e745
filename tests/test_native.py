"""Native I/O core (libbamcore.so) vs the Python implementations."""
import gzip

import numpy as np
import pytest

from hifimeth_tpu.io import native
from hifimeth_tpu.io.bgzf import BGZF_EOF, BgzfWriter

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="libbamcore.so not built")


def test_bgzf_inflate_matches_python(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, 500_000, dtype=np.uint8).tobytes()
    p = tmp_path / "x.bgzf"
    w = BgzfWriter(p)
    w.write(data)
    w.close()
    comp = np.frombuffer(p.read_bytes(), np.uint8)
    payload, consumed = native.bgzf_inflate_buffer(comp)
    assert consumed == len(comp)
    assert payload == data + b""     # EOF block decompresses to nothing


def test_bgzf_inflate_partial_block(tmp_path):
    data = b"hello world" * 10000
    p = tmp_path / "x.bgzf"
    w = BgzfWriter(p)
    w.write(data)
    w.close()
    comp = np.frombuffer(p.read_bytes(), np.uint8)
    # truncate mid-final-block: consumed must stop at last complete block
    cut = comp[:-10]
    payload, consumed = native.bgzf_inflate_buffer(cut)
    assert consumed < len(cut)
    assert data.startswith(payload)


def test_bgzf_compress_is_valid_gzip():
    rng = np.random.default_rng(1)
    data = rng.integers(0, 256, 300_000, dtype=np.uint8).tobytes()
    comp = native.bgzf_compress_buffer(data, level=4)
    assert gzip.decompress(comp + BGZF_EOF) == data
    # and our own inflater round-trips it
    payload, consumed = native.bgzf_inflate_buffer(np.frombuffer(comp, np.uint8))
    assert payload == data


def test_seq_unpack_matches_python():
    from hifimeth_tpu.io.bam import BamRecord
    rng = np.random.default_rng(2)
    for l in (1, 2, 7, 100):
        seq = rng.choice(list(b"ACGTN"), l).astype(np.uint8)
        rec = BamRecord()
        rec.set_seq(seq)
        got = native.seq_unpack(rec.seq_nibbles, l)
        np.testing.assert_array_equal(got, rec.seq_ascii())


def test_revcomp_matches_python():
    from hifimeth_tpu.constants import BASE_COMPLEMENT
    rng = np.random.default_rng(3)
    seq = rng.choice(list(b"ACGTNacgt"), 999).astype(np.uint8)
    got = native.revcomp(seq)
    want = BASE_COMPLEMENT[seq[::-1]]
    np.testing.assert_array_equal(got, want)


def test_encode_codev1_matches_python():
    from hifimeth_tpu.constants import encode_frames_codev1
    frames = np.arange(0, 1500, dtype=np.uint16)
    got = native.encode_codev1(frames)
    np.testing.assert_array_equal(got, encode_frames_codev1(frames))
