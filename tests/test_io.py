"""Image I/O and environment-light tests."""
import struct
import zlib

import numpy as np
import jax
import jax.numpy as jnp

from rrt_tpu.io.exr import read_exr, write_exr
from rrt_tpu.io.png import read_png, write_png
from rrt_tpu.scene.envmap import build_envmap, sample_L, sample_dir


def test_png_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (17, 23, 4), dtype=np.uint8)
    p = str(tmp_path / "t.png")
    write_png(p, img)
    back = read_png(p)
    np.testing.assert_array_equal(back, img)


def test_exr_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    img = (rng.uniform(0, 4, (16, 32, 3)) ** 2).astype(np.float32)
    p = str(tmp_path / "t.exr")
    write_exr(p, img)
    np.testing.assert_array_equal(read_exr(p), img)


def test_exr_zips_compressed(tmp_path):
    """Hand-build a ZIPS (per-scanline zip) EXR and read it back."""
    rng = np.random.default_rng(2)
    h, w = 6, 8
    img = rng.uniform(0, 2, (h, w, 3)).astype(np.float32)
    p = str(tmp_path / "z.exr")
    # write uncompressed first to reuse the header builder, then rewrite
    write_exr(p, img)
    buf = bytearray(open(p, "rb").read())
    # patch compression attr (value byte right after 'compression\0...\0size')
    key = b"compression\x00compression\x00"
    i = bytes(buf).index(key) + len(key) + 4
    buf[i] = 2  # ZIPS

    # rebuild scanline blocks with zip post-processing inverse
    def compress_line(y):
        raw = (img[y, :, 2].tobytes() + img[y, :, 1].tobytes()
               + img[y, :, 0].tobytes())
        arr = np.frombuffer(raw, np.uint8)
        half = (len(arr) + 1) // 2
        inter = np.zeros(len(arr), np.uint8)
        inter[:half] = arr[0::2]
        inter[half:] = arr[1::2]
        d = inter.astype(np.int64)
        enc = np.concatenate([d[:1], (d[1:] - d[:-1]) + 128]).astype(np.uint8)
        return zlib.compress(enc.tobytes())

    key_end = bytes(buf).index(b"screenWindowWidth")
    hdr_end = bytes(buf).index(b"\x00", key_end + 40) + 1
    # find the end of the header: the attr list terminator after the last attr
    # (simpler: locate the offset table written by write_exr)
    # write_exr layout: head | table (h*8) | lines
    head_len = len(buf) - (8 * h + h * (8 + 3 * 4 * w))
    head = bytes(buf[:head_len])
    blocks = [compress_line(y) for y in range(h)]
    offsets = []
    pos = head_len + 8 * h
    out = bytearray(head)
    for y, b in enumerate(blocks):
        offsets.append(pos)
        pos += 8 + len(b)
    out += struct.pack(f"<{h}Q", *offsets)
    for y, b in enumerate(blocks):
        out += struct.pack("<iI", y, len(b)) + b
    open(p, "wb").write(bytes(out))
    back = read_exr(p)
    np.testing.assert_array_equal(back, img)


def test_envmap_importance_sampling_statistics():
    """Samples concentrate where the (sin-weighted) luminance is."""
    h, w = 16, 32
    img = np.full((h, w, 3), 0.01, np.float32)
    img[8, 5] = 50.0  # bright texel mid-latitude
    env = build_envmap(img)
    rad, wi, dist, pdf = sample_L(env, jax.random.key(0), (4096,))
    # the bright texel's direction should dominate
    theta = 8 / h * np.pi
    phi = 5 / w * 2 * np.pi
    y = np.cos(theta)
    frac = (np.abs(np.asarray(wi)[:, 1] - y) < 0.05).mean()
    assert frac > 0.5
    assert np.isfinite(np.asarray(pdf)).all()
    assert (np.asarray(pdf) > 0).all()


def test_envmap_sample_dir_matches_map():
    h, w = 8, 16
    img = np.zeros((h, w, 3), np.float32)
    img[:, :, 0] = np.linspace(0, 1, w)[None, :]
    env = build_envmap(img + 0.01)
    # +y is the pole (theta=0 → row 0); a horizontal direction maps to the
    # equator row; radiance should be finite and sane everywhere
    d = jnp.asarray(np.array([[1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1]],
                             np.float32))
    out = np.asarray(sample_dir(env, d))
    assert np.isfinite(out).all()
    assert (out >= 0).all()
