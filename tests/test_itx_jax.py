"""JAX batched itx must bit-match the scalar reference (and thereby the
oracle) for every tx size / type, including eob-free batching."""
import numpy as np
import pytest

from dav1d_tpu import tables
from dav1d_tpu.entropy import levels as lv
from dav1d_tpu.ops import itx_ref
from dav1d_tpu.ops.itx import residual_fn

from tests.test_itx import allowed_txtps


@pytest.mark.parametrize("tx", range(lv.N_RECT_TX_SIZES))
def test_jax_residual_matches_ref(tx):
    import jax.numpy as jnp
    rng = np.random.default_rng(tx)
    t = lv.TXFM_INFO[tx]
    w, h = t.w * 4, t.h * 4
    sw, sh = min(w, 32), min(h, 32)
    for txtp in allowed_txtps(tx):
        B = 5
        # scan order per tx class (decode.py rc mapping): 2-D classes use
        # the scan table; H is identity; V transposes
        tx_class = int(lv.tx_type_class[txtp])
        slw, slh = min(t.lw, 3), min(t.lh, 3)
        if tx_class == lv.TX_CLASS_2D:
            scan = tables.scan(tx)
        elif tx_class == lv.TX_CLASS_H:
            scan = np.arange(sw * sh)
        else:
            i = np.arange(sw * sh)
            x = i & ((4 << slw) - 1)
            y = i >> (slw + 2)
            scan = (x << (slh + 2)) | y
        cfs, eobs = [], []
        for i in range(B):
            eob = int(rng.integers(0, sw * sh))
            cf = np.zeros(sw * sh, np.int32)
            idxs = scan[rng.choice(eob + 1, size=min(8, eob + 1),
                                   replace=False)]
            cf[idxs] = rng.integers(-0x7FFF, 0x8000, len(idxs))
            cfs.append(cf)
            eobs.append(eob)
        cf_batch = np.stack(cfs)
        res_jax = np.asarray(residual_fn(tx, txtp, 8)(jnp.asarray(cf_batch)))
        for i in range(B):
            dst = np.zeros((h, w), np.uint16)
            ref = dst.copy()
            itx_ref.inv_txfm_add(ref, cfs[i].copy(), eobs[i], tx, txtp, 8)
            mine = np.clip(res_jax[i], 0, 255).astype(np.uint16)
            np.testing.assert_array_equal(
                mine, ref, err_msg=f"tx={tx} txtp={txtp} i={i}")
