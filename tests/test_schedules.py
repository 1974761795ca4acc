"""LR schedule shape tests (reference open_clip_train.scheduler semantics)."""
import numpy as np

from colxlip_tpu.training.schedules import const_lr, const_lr_cooldown, cosine_lr


def test_cosine_warmup_and_decay():
    s = cosine_lr(1e-3, warmup_length=10, steps=110)
    assert float(s(0)) < float(s(5)) < float(s(9))          # warming up
    np.testing.assert_allclose(float(s(10)), 1e-3, rtol=1e-5)  # peak at warmup end
    assert float(s(60)) < 1e-3
    assert float(s(109)) < float(s(60))
    np.testing.assert_allclose(float(s(110)), 0.0, atol=1e-9)  # cosine hits 0


def test_const_lr():
    s = const_lr(2e-4, warmup_length=4)
    assert float(s(0)) < 2e-4
    np.testing.assert_allclose(float(s(4)), 2e-4, rtol=1e-6)
    np.testing.assert_allclose(float(s(1000)), 2e-4, rtol=1e-6)


def test_const_cooldown():
    s = const_lr_cooldown(1e-3, warmup_length=5, steps=100, cooldown_steps=20,
                          cooldown_power=1.0, cooldown_end_lr=1e-5)
    np.testing.assert_allclose(float(s(50)), 1e-3, rtol=1e-6)   # plateau
    assert float(s(90)) < 1e-3                                   # cooling
    np.testing.assert_allclose(float(s(100)), 1e-5, rtol=1e-4)  # end lr


def test_const_cooldown_warmup_precedence_and_no_negative_lr():
    """Reference open_clip const_lr_cooldown checks warmup FIRST; and a run
    past total_steps must hold end_lr, not go negative."""
    import numpy as np

    from colxlip_tpu.training.schedules import const_lr_cooldown

    s = const_lr_cooldown(1e-3, warmup_length=90, steps=100,
                          cooldown_steps=50)
    # step 60 is inside both windows: warmup wins (reference order)
    assert abs(float(s(60)) - (61 / 90) * 1e-3) < 1e-9
    # past the end: clamped at the cooldown floor, never negative
    assert float(s(105)) >= 0.0
    assert float(s(1000)) >= 0.0
