import numpy as np
import pytest

from geotreehealth_ray.functions import codec


def _img(h, w, c, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, c) if c > 1 else (h, w), dtype=np.uint8)


@pytest.mark.parametrize("shape", [(16, 16, 3), (199, 98, 3), (7, 13, 1), (32, 32, 4)])
def test_png_roundtrip_exact(shape):
    img = _img(*shape) if len(shape) == 3 and shape[2] > 1 else _img(shape[0], shape[1], shape[2] if len(shape) == 3 else 1)
    data = codec.encode_png(img)
    out = codec.decode_png(data)
    np.testing.assert_array_equal(np.squeeze(out), np.squeeze(img))


def test_png_signature():
    data = codec.encode_png(_img(8, 8, 3))
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    assert data.endswith(b"IEND" + bytes.fromhex("AE426082"))


def test_qdct_psnr_gate():
    # smooth-ish natural-looking image: gradient + noise
    rng = np.random.default_rng(42)
    yy, xx = np.mgrid[0:64, 0:96]
    base = (xx * 2 + yy) % 256
    img = np.clip(base[:, :, None] + rng.normal(0, 8, (64, 96, 3)), 0, 255).astype(np.uint8)
    data = codec.encode_qdct(img)
    out = codec.decode_qdct(data)
    assert out.shape == img.shape
    assert codec.psnr(img, out) >= 40.0  # BASELINE.json lossy gate


def test_qdct_nonmultiple_of_8():
    img = _img(17, 23, 3, seed=1)
    out = codec.decode_qdct(codec.encode_qdct(img))
    assert out.shape == img.shape


def test_npy_roundtrip():
    arr = np.random.default_rng(3).normal(size=(5, 4, 3)).astype(np.float32)
    out = codec.decode_npy(codec.encode_npy(arr))
    np.testing.assert_array_equal(out, arr)
    assert out.dtype == arr.dtype


def test_autodetect():
    img = _img(8, 8, 3)
    assert np.array_equal(codec.decode(codec.encode(img, "png")), img)
    assert codec.decode(codec.encode(img, "qdct")).shape == img.shape


def test_average_hash_stable_and_discriminative():
    a = _img(64, 64, 3, seed=1)
    h1 = codec.average_hash(a)
    h2 = codec.average_hash(a.copy())
    assert h1 == h2
    b = _img(64, 64, 3, seed=2)
    assert codec.average_hash(b) != h1
    assert -(2**63) <= h1 < 2**63


def test_idct_window_bit_identical_to_full_decode():
    from geotreehealth_ray.functions import codec

    rng = np.random.default_rng(3)
    for h, w, c in [(288, 288, 3), (61, 77, 3), (40, 40, 1)]:
        img = rng.integers(0, 256, (h, w, c), dtype=np.uint8)
        if c == 1:
            img = img[:, :, 0]
        data = codec.encode_qdct(img)
        full = codec.decode_qdct(data)
        coef, hh, ww, cc = codec.decode_qdct_blocks(data)
        assert (hh, ww) == (h, w)
        windows = [(0, h, 0, w), (0, 1, 0, 1), (5, 23, 9, 31),
                   (h - 7, h, w - 3, w), (8, 16, 16, 24)]
        for r0, r1, c0, c1 in windows:
            if r0 >= h or c0 >= w:
                continue
            win = codec.idct_window(coef, hh, ww, r0, r1, c0, c1)
            ref = full[r0:r1, c0:c1]
            assert win.shape == ref.shape
            assert (win == ref).all(), (h, w, c, r0, r1, c0, c1)
