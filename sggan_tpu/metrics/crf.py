"""Dense-CRF label refinement — capability parity with the reference's
metric.py:49-129 (pydensecrf wrapper + five scoring adapters), backed by a
first-party C++ permutohedral-lattice implementation (native/crf/) loaded
via ctypes.  A numpy brute-force fallback covers small inputs when the
native library cannot be built.

Constants match metric.py:11-16: 10 iterations, Gaussian (sxy=1, w=3),
bilateral (sxy=67, srgb=3, w=4).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

MAX_ITER = 10
POS_W = 3.0
POS_XY_STD = 1.0
Bi_W = 4.0
Bi_XY_STD = 67.0
Bi_RGB_STD = 3.0

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native", "crf")
_LIB: Optional[ctypes.CDLL] = None
_LIB_TRIED = False


def _load_native() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_TRIED
    if _LIB is not None or _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    so = os.path.join(_NATIVE_DIR, "libsgcrf.so")
    if not os.path.exists(so):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=300)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.dense_crf_2d.restype = ctypes.c_int
    lib.dense_crf_2d.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_void_p, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_float,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.POINTER(ctypes.c_float)]
    lib.permutohedral_filter.restype = ctypes.c_int
    lib.permutohedral_filter.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float)]
    _LIB = lib
    return _LIB


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def permutohedral_filter(features: np.ndarray, values: np.ndarray
                         ) -> np.ndarray:
    """High-dim Gaussian filter of `values` [n, vs] by `features` [n, d]
    via the native lattice (test/diagnostic entry)."""
    lib = _load_native()
    if lib is None:
        raise RuntimeError("native CRF library unavailable")
    f = np.ascontiguousarray(features, np.float32)
    v = np.ascontiguousarray(values, np.float32)
    out = np.zeros_like(v)
    lib.permutohedral_filter(_fptr(f), f.shape[0], f.shape[1], _fptr(v),
                             v.shape[1], _fptr(out))
    return out


def unary_from_softmax(probs: np.ndarray, clip: float = 1e-5) -> np.ndarray:
    """(C, H, W) class probabilities -> negative-log unary (pydensecrf
    utils.unary_from_softmax parity)."""
    return -np.log(np.clip(probs, clip, 1.0))


def _mean_field_numpy(unary_hwc: np.ndarray, img: Optional[np.ndarray],
                      n_iter: int) -> np.ndarray:
    """Brute-force O(N^2) mean field for small images (fallback/oracle)."""
    h, w, c = unary_hwc.shape
    n = h * w
    yy, xx = np.mgrid[0:h, 0:w]
    pos = np.stack([xx.ravel(), yy.ravel()], -1).astype(np.float64)
    d2 = ((pos[:, None, :] - pos[None, :, :]) ** 2).sum(-1)
    # NOTE: keep the self-interaction term — the permutohedral path
    # includes it (as does the reference's pydensecrf), so the oracle must.
    k_gauss = np.exp(-d2 / (2 * POS_XY_STD ** 2))
    kernels = [(POS_W, k_gauss)]
    if img is not None:
        rgb = img.reshape(n, 3).astype(np.float64)
        dr2 = ((rgb[:, None, :] - rgb[None, :, :]) ** 2).sum(-1)
        k_bi = np.exp(-d2 / (2 * Bi_XY_STD ** 2) - dr2 / (2 * Bi_RGB_STD ** 2))
        kernels.append((Bi_W, k_bi))
    # symmetric normalization like the lattice path
    u = unary_hwc.reshape(n, c)
    q = _softmax(-u)
    norms = []
    for w_, k in kernels:
        nrm = 1.0 / np.sqrt(np.maximum(k.sum(1), 1e-20))
        norms.append(nrm)
    for _ in range(n_iter):
        e = -u.copy()
        for (w_, k), nrm in zip(kernels, norms):
            e += w_ * (nrm[:, None] * (k @ (q * nrm[:, None])))
        q = _softmax(e)
    return q.reshape(h, w, c)


def _softmax(e):
    e = e - e.max(-1, keepdims=True)
    q = np.exp(e)
    return q / q.sum(-1, keepdims=True)


def dense_crf(img: np.ndarray, output_probs: np.ndarray) -> np.ndarray:
    """Reference signature (metric.py:49-69): img (H, W, 3) uint8,
    output_probs (C, H, W) softmax scores -> refined (C, H, W)."""
    c, h, w = output_probs.shape
    unary = unary_from_softmax(output_probs)           # (C, H, W)
    unary_hwc = np.ascontiguousarray(
        unary.transpose(1, 2, 0).reshape(h * w, c), np.float32)
    img_c = None
    if img is not None:
        img_c = np.ascontiguousarray(img[..., :3], np.uint8)

    lib = _load_native()
    if lib is not None:
        out = np.zeros_like(unary_hwc)
        lib.dense_crf_2d(
            _fptr(unary_hwc),
            img_c.ctypes.data_as(ctypes.c_void_p) if img_c is not None
            else None,
            w, h, c, MAX_ITER,
            POS_W, POS_XY_STD, Bi_W, Bi_XY_STD, Bi_RGB_STD,
            _fptr(out))
        q = out.reshape(h, w, c)
    else:
        q = _mean_field_numpy(unary_hwc.reshape(h, w, c),
                              img_c, MAX_ITER)
    return np.ascontiguousarray(q.transpose(2, 0, 1))


# ------------------------- scoring adapters (metric.py:79-129 parity) ----

def scores_mask_sample_crf(seg_mask_full, rescaled_sample):
    """true: argmax of the one-hot mask; pred: CRF(sample, mask)
    (metric.py:79-89)."""
    sample_u8 = np.asarray(rescaled_sample).astype(np.uint8)
    mask_u8 = np.asarray(seg_mask_full).astype(np.uint8).transpose(0, 3, 2, 1)
    labels = np.argmax(mask_u8, axis=1)
    q = dense_crf(sample_u8[0], mask_u8[0].astype(np.float32))
    preds = np.expand_dims(np.argmax(q, axis=0), 0)
    return labels, preds


def scores_fake_mask_crf(seg_mask_full, rescaled_sample, fake_img):
    """true: argmax of fake image channels; pred: CRF(sample, mask)
    (metric.py:92-102)."""
    sample_u8 = np.asarray(rescaled_sample).astype(np.uint8)
    mask_u8 = np.asarray(seg_mask_full).astype(np.uint8).transpose(0, 3, 2, 1)
    q = dense_crf(sample_u8[0], mask_u8[0].astype(np.float32))
    preds = np.expand_dims(np.argmax(q, axis=0), 0)
    fake_u8 = (255 * np.asarray(fake_img)).astype(np.uint8)
    labels = np.argmax(fake_u8.transpose(0, 3, 2, 1), axis=1)
    return labels, preds


def scores_mask_fake_crf(rescaled_sample, seg_mask_full, fake_img):
    """true: argmax of the mask; pred: CRF(sample, fake image channels)
    (metric.py:116-129)."""
    sample_u8 = np.asarray(rescaled_sample).astype(np.uint8)
    mask_u8 = np.asarray(seg_mask_full).astype(np.uint8).transpose(0, 3, 2, 1)
    fake_u8 = (255 * np.asarray(fake_img)).astype(np.uint8).transpose(0, 3, 2, 1)
    q = dense_crf(sample_u8[0], fake_u8[0].astype(np.float32))
    labels = np.argmax(mask_u8, axis=1)
    preds = np.expand_dims(np.argmax(q, axis=0), 0)
    return labels, preds


def scores_seg_da_fake(seg_image, da_fake, stride: int = 8):
    """true: argmax of seg channels; pred: nearest-upsampled discriminator
    output map (metric.py:105-114)."""
    da = np.asarray(da_fake)
    da_up = da.repeat(stride, axis=1).repeat(stride, axis=2)
    da_u8 = (255 * np.clip(da_up, 0, 1)).astype(np.uint8).transpose(0, 3, 2, 1)
    preds = da_u8[0]
    seg_u8 = (255 * np.asarray(seg_image)).astype(np.uint8)
    gts = np.argmax(seg_u8.transpose(0, 3, 2, 1), axis=1)
    return gts, preds
