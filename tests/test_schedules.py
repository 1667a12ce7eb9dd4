import math

import numpy as np

from transformertts_tpu.train.schedules import noam_schedule, teacher_forcing_ratio


def ref_noam(d_model, warmup, step):
    # reference lr_lambda (utils/util.py:46-48) with base lr 1.0
    step = max(step, 1)
    return (d_model ** -0.5) * min(step ** -0.5, step * (warmup ** -1.5))


def test_noam_matches_reference():
    sched = noam_schedule(256, 4000)
    for step in [0, 1, 10, 500, 4000, 4001, 20000, 100000]:
        assert abs(float(sched(step)) - ref_noam(256, 4000, step)) < 1e-9, step


def test_noam_peak_at_warmup():
    sched = noam_schedule(256, 4000)
    values = [float(sched(s)) for s in range(1, 10001, 100)]
    peak_idx = int(np.argmax(values))
    assert abs((1 + peak_idx * 100) - 4000) <= 100


def ref_tf_ratio(epoch, total=300, mode="linear", warmup=10):
    # reference get_teacher_forcing_ratio (utils/util.py:54-92)
    if epoch < warmup:
        return 1.0
    adj, tot = epoch - warmup, max(total - warmup, 1)
    if mode == "cosine":
        return max(min(0.5 * math.cos(math.pi * adj / tot) + 0.5, 1.0), 0.5)
    if mode == "linear":
        return max(1.0 - adj / tot, 0.05)
    return 1.0


def test_teacher_forcing_matches_reference():
    for mode in ("linear", "cosine", "constant"):
        for epoch in [0, 5, 9, 10, 11, 50, 150, 290, 299]:
            got = teacher_forcing_ratio(epoch, 300, mode, 10)
            want = ref_tf_ratio(epoch, 300, mode, 10)
            assert abs(got - want) < 1e-12, (mode, epoch)


def test_linear_floor():
    assert teacher_forcing_ratio(299, 300, "linear") >= 0.05
    assert teacher_forcing_ratio(5, 300, "linear") == 1.0
