"""eval-metrics numeric parity vs the LIVE reference utils/eval.py
(pure numpy, runnable in-env — VERDICT r2 missing #5).

Replays the reference main()'s exact computation sequence
(utils/eval.py:77-108) with its own functions on synthetic results and
asserts apps/eval_metrics.evaluate_results returns the same numbers."""

import sys

import numpy as np

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

from utils import eval as ref_eval  # noqa: E402

from audio2photoreal_tpu.apps.eval_metrics import evaluate_results  # noqa: E402


def test_eval_metrics_match_reference():
    rng = np.random.RandomState(42)
    num_samples, n, nfeats, T = 5, 4, 104, 600
    pred = rng.randn(num_samples, n, nfeats, T).astype(np.float64)
    gt = pred + 0.3 * rng.randn(*pred.shape)

    # ---- reference computation (utils/eval.py:77-108, verbatim order) ----
    cross_var_ref = np.var(pred.reshape(num_samples, -1), axis=0).mean()
    pred_last = pred.transpose(0, 1, 3, 2).reshape(-1, nfeats)
    gt_last = gt.transpose(0, 1, 3, 2).reshape(-1, nfeats)
    np.random.seed(0)  # reference samples via the GLOBAL rng (eval.py:19-20)
    var_g_ref = ref_eval.calculate_diversity(pred_last).mean()
    var_k_ref = np.var(pred, axis=-1).mean()
    mu_p, cov_p = ref_eval.calculate_activation_statistics(pred_last)
    mu_g, cov_g = ref_eval.calculate_activation_statistics(gt_last)
    fid_g_ref = ref_eval.calculate_frechet_distance(mu_g, cov_g, mu_p, cov_p)
    pred_vel = pred[..., 1:] - pred[..., :-1]
    gt_vel = gt[..., 1:] - gt[..., :-1]
    mu_pk, cov_pk = ref_eval.calculate_activation_statistics(
        pred_vel.transpose(0, 1, 3, 2).reshape(-1, nfeats)
    )
    mu_gk, cov_gk = ref_eval.calculate_activation_statistics(
        gt_vel.transpose(0, 1, 3, 2).reshape(-1, nfeats)
    )
    fid_k_ref = ref_eval.calculate_frechet_distance(mu_gk, cov_gk, mu_pk, cov_pk)

    # ---- this framework ----
    out = evaluate_results(pred, gt, nfeats)

    assert np.isclose(out["cross_var"], cross_var_ref, rtol=1e-9), "cross_var"
    # same seed → same index pairs → identical diversity sample
    assert np.isclose(out["var_g"], var_g_ref, rtol=1e-9), "var_g"
    assert np.isclose(out["var_k"], var_k_ref, rtol=1e-9), "var_k"
    assert np.isclose(out["fid_g"], fid_g_ref, rtol=1e-6), "fid_g"
    assert np.isclose(out["fid_k"], fid_k_ref, rtol=1e-6), "fid_k"
