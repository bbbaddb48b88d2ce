"""DigitalMicrograph (.dm3/.dm4) input path, driven against real bytes.

The reference reads DM files through ncempy (3D EELS,
reference cyTVDN/mpi.py:97-101) and py4DSTEM (4D-STEM, mpi.py:107-109).
Neither is installed here, so these tests exercise the dependency-free
built-in tag-tree reader (``cytvdn_tpu/io/dm.py``) through the same
``open_input`` surface the reference's loaders sit behind — including
the dataset-index scan over a leading thumbnail entry, the
leading-singleton squeeze (mpi.py:100-101), lazy block reads, and a CLI
end-to-end run with a .dm4 input.
"""

import numpy as np
import pytest

from cytvdn_tpu.io.dm import read_dm_datasets, write_dm
from cytvdn_tpu.io.loaders import load_input, open_input

RNG = np.random.default_rng(41)


@pytest.mark.parametrize("version", [3, 4])
@pytest.mark.parametrize("dtype", [np.float32, np.uint16, np.float64])
def test_dm_roundtrip(tmp_path, version, dtype):
    """Writer emits spec-conformant bytes the parser maps back losslessly
    — thumbnail at dataset index 0, data at index 1 (ImageList order,
    ncempy's numbering)."""
    data = (RNG.standard_normal((5, 6, 7)) * 100).astype(dtype)
    p = str(tmp_path / f"cube.dm{version}")
    write_dm(p, data, version=version)
    dsets = read_dm_datasets(p)
    assert len(dsets) == 2
    assert dsets[0].shape == (4, 4)  # thumbnail
    assert dsets[1].shape == data.shape
    assert dsets[1].dtype.newbyteorder("=") == np.dtype(dtype)
    np.testing.assert_array_equal(dsets[1].memmap(), data)


@pytest.mark.parametrize("shape", [(6, 8, 10), (3, 4, 5, 6)])
def test_dm_open_input(tmp_path, shape):
    """3D (EELS) and 4D (4D-STEM) cubes through the uniform lazy handle:
    the index scan skips the thumbnail, block reads slice the memmap."""
    data = (RNG.standard_normal(shape) * 0.3 + 1.0).astype(np.float32)
    p = str(tmp_path / "cube.dm4")
    write_dm(p, data)
    with open_input(p) as h:
        assert h.shape == shape
        assert h.dtype.newbyteorder("=") == np.float32
        sel = (slice(1, 3),) + tuple(slice(None) for _ in shape[1:])
        np.testing.assert_array_equal(h.read_block(sel), data[1:3])
        np.testing.assert_array_equal(h.read(), data)
    np.testing.assert_array_equal(load_input(p), data)


def test_dm_no_thumbnail(tmp_path):
    """Files whose data sits at index 0 (no thumbnail) still open: the
    scan walks down from index 2 (the reference hard-codes 2,
    mpi.py:97-98; real files differ)."""
    data = RNG.standard_normal((4, 5, 6)).astype(np.float32)
    p = str(tmp_path / "flat.dm4")
    write_dm(p, data, thumbnail=False)
    with open_input(p) as h:
        assert h.shape == data.shape
        np.testing.assert_array_equal(h.read(), data)


def test_dm_leading_singleton_squeeze(tmp_path):
    """A (1, R, Q1, Q2) acquisition squeezes its leading singleton while
    staying lazy — the reference's reshape at mpi.py:100-101."""
    data = RNG.standard_normal((1, 4, 6, 8)).astype(np.float32)
    p = str(tmp_path / "sq.dm4")
    write_dm(p, data)
    with open_input(p) as h:
        assert h.shape == (4, 6, 8)
        np.testing.assert_array_equal(h.read(), data[0])


def test_dm_garbage_rejected(tmp_path):
    """Non-DM bytes fail loudly with the file named, not a decode crash
    at call depth."""
    p = tmp_path / "junk.dm4"
    p.write_bytes(b"\x00" * 64)
    with pytest.raises(ValueError, match="unsupported DM version"):
        open_input(str(p))
    short = tmp_path / "short.dm3"
    short.write_bytes(b"\x03")
    with pytest.raises(ValueError, match="too short"):
        open_input(str(short))


def test_dm_corrupt_dims_skipped(tmp_path):
    """An entry whose Dimensions product disagrees with its Data length
    is skipped (never mis-shaped); the good entry still loads."""
    import struct

    data = RNG.standard_normal((4, 5, 6)).astype(np.float32)
    p = str(tmp_path / "c.dm4")
    write_dm(p, data)  # thumbnail (16 u8 elements) + data
    raw = bytearray(open(p, "rb").read())
    # corrupt the THUMBNAIL's first Dimensions scalar (u4le value 4 -> 7):
    # its Data payload is 16 zero bytes; the first unnamed u4le scalar
    # after it is the dimension entry
    pat = np.asarray([4], "<u4").tobytes()
    idx = raw.find(pat, raw.find(b"Dimensions"))
    assert idx > 0
    raw[idx:idx + 4] = struct.pack("<I", 7)
    open(p, "wb").write(bytes(raw))
    dsets = read_dm_datasets(p)
    shapes = [d.shape for d in dsets]
    assert data.shape in shapes and (4, 4) not in shapes


def test_dm_cli_end_to_end(tmp_path):
    """`cytv -i cube.dm4 -o out.emd` — the reference's primary microscopy
    input format through the full pipeline (mpi.py:97-109 semantics)."""
    from cytvdn_tpu.cli import main
    from cytvdn_tpu.io.emd import read_emd

    data = (RNG.standard_normal((6, 8, 16)) * 0.3 + 1.0).astype(np.float32)
    inp = str(tmp_path / "in.dm4")
    write_dm(inp, data)
    out = str(tmp_path / "out.emd")
    rc = main(["-i", inp, "-o", out, "-m", "1.0", "-n", "5", "-f", "1",
               "-v", "0"])
    assert rc == 0
    recon = read_emd(out)
    assert recon.shape == data.shape
    assert np.all(np.isfinite(recon))
    assert not np.array_equal(recon, data)
