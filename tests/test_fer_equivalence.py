"""Statistical FER equivalence: device decoder vs the per-frame NumPy
reference decoder (the baseline stand-in for the reference's C bp_decoder),
at an operating point with measurable frame-error rate."""

import numpy as np

from bench import cpu_reference_decode
from sca_ldpc_tpu.codes.layout import CirculantLayout
from sca_ldpc_tpu.codes.make_code import random_circulant_first_row
from sca_ldpc_tpu.ops.circulant_bp import CirculantBPDecoder
from sca_ldpc_tpu.utils import make_random_state


def test_fer_matches_reference_decoder():
    rng = make_random_state(0)
    n, w = 256, 5
    row = random_circulant_first_row(n, w, rng)
    lay = CirculantLayout.from_first_row(row, with_identity=True)
    rate = 0.045  # near threshold for this small code
    frames = 160
    probs = np.full(2 * n, rate, np.float32)
    prior = np.log((1 - probs) / probs).astype(np.float64)

    errors = (rng.rand(frames, 2 * n) < rate).astype(int)
    syn = np.stack(
        [
            (sum(np.roll(e[:n], k) for k in lay.shifts) + e[n:]) % 2
            for e in errors
        ]
    )

    dec = CirculantBPDecoder(lay, max_iter=40, method="product_sum")
    device_out = np.asarray(dec.decode_syndrome(syn, probs))
    device_ok = (device_out == errors).all(axis=1)

    ref_ok = np.zeros(frames, bool)
    for i in range(frames):
        e_hat, _ = cpu_reference_decode(lay, prior, syn[i], max_iter=40)
        ref_ok[i] = (e_hat == errors[i]).all()

    fer_dev = 1 - device_ok.mean()
    fer_ref = 1 - ref_ok.mean()
    # identical algorithm up to float association order: FERs must agree
    # within binomial noise (3 sigma for 160 frames)
    sigma = np.sqrt(max(fer_ref * (1 - fer_ref), 0.01) / frames)
    assert abs(fer_dev - fer_ref) <= max(3 * sigma, 0.05), (fer_dev, fer_ref)
    # and the vast majority of individual frames decode identically
    assert (device_ok == ref_ok).mean() > 0.95
