import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from medsegpretrainimagenet_tpu.config import ConfigDict
from medsegpretrainimagenet_tpu.optim import Optimizer, build_schedule


def lr_seq(spec, steps, bpe=1):
    fn = spec.global_fn(bpe)
    return [float(fn(jnp.asarray(s))) for s in range(steps)]


def test_constant_schedule():
    spec = build_schedule(ConfigDict({"constant": {"base": 0.3}}))
    assert lr_seq(spec, 3) == pytest.approx([0.3, 0.3, 0.3])


def test_poly_schedule():
    cfg = ConfigDict({"optim.scheduler.PolyLearningRateDecay": {
        "base": 1.0, "exponent": 0.9, "iteration_unit": "batch",
        "number_of_iterations": "auto"}})
    spec = build_schedule(cfg, num_epochs=2, batches_per_epoch=5)
    values = lr_seq(spec, 10)
    # reference trajectory: lr at step s is (1 - (s-2)/N)^gamma with a
    # (1 + 1/N)^gamma bump at s == 1 (its step() reads the counter
    # pre-increment from last_epoch=-1) — see test_scheduler_parity.py
    assert values[0] == 1.0
    assert np.allclose(values[1], (1 + 1 / 10) ** 0.9)
    assert np.allclose(values[5], (1 - 3 / 10) ** 0.9)
    assert values[-1] < values[0]


def test_cosine_schedule():
    cfg = ConfigDict({"optim.scheduler.CosineAnnealingLR": {
        "base": 1.0, "eta_min": 0.1, "T_max": 10}})
    spec = build_schedule(cfg, num_epochs=10)
    values = lr_seq(spec, 11)
    assert values[0] == 1.0
    assert abs(values[10] - 0.1) < 1e-6
    assert abs(values[5] - 0.55) < 1e-6


def test_linear_schedule():
    cfg = ConfigDict({"optim.scheduler.LinearLR": {
        "base": 2.0, "start_factor": 0.5, "end_factor": 1.0,
        "total_iters": 4}})
    spec = build_schedule(cfg)
    values = lr_seq(spec, 6)
    assert values[0] == 1.0  # 2.0 * 0.5
    assert values[4] == 2.0
    assert values[5] == 2.0  # stays at end factor


def test_exponential_auto_gamma():
    cfg = ConfigDict({"optim.scheduler.ExponentialLR": {
        "base": 1.0, "gamma": "auto", "min_scale": 0.01,
        "iteration_unit": "epoch"}})
    spec = build_schedule(cfg, num_epochs=10)
    values = lr_seq(spec, 11)
    assert abs(values[10] - 0.01) < 1e-6


def test_gaussian_schedule():
    cfg = ConfigDict({"optim.scheduler.GaussianLRDecay": {
        "base": 1.0, "min_scale": 0.001, "number_of_iterations": 10,
        "iteration_unit": "batch"}})
    spec = build_schedule(cfg)
    values = lr_seq(spec, 12)
    assert abs(values[10] - 0.001) < 1e-6
    assert abs(values[11] - 0.001) < 1e-6  # decay stops at horizon


def test_step_schedule():
    cfg = ConfigDict({"optim.scheduler.StepLearningRateScheduler": {
        "base": 0.1, "learning_rates_dict": {3: 0.01, 6: 0.001}}})
    spec = build_schedule(cfg)
    values = lr_seq(spec, 8)
    assert values[0] == pytest.approx(0.1)
    assert values[3] == pytest.approx(0.01)
    assert values[6] == pytest.approx(0.001)


def test_sequential_linear_then_cosine():
    """The pretraining AdamW recipe: linear ramp 20 epochs -> cosine."""
    cfg = ConfigDict({"optim.scheduler.SequentialLR": {
        "base": 0.004,
        "schedulers": ({"optim.scheduler.LinearLR": {
            "start_factor": 1.0e-6, "end_factor": 1.0}},
            {"optim.scheduler.CosineAnnealingLR": {"eta_min": 1.0e-6}}),
        "milestones": 2,
        "iteration_unit": "batch",
        "milestones_unit": "epoch"}})
    spec = build_schedule(cfg, num_epochs=10, batches_per_epoch=4)
    assert spec.unit == "batch"
    values = lr_seq(spec, 41)
    assert values[0] < 1e-6  # ramp starts tiny
    assert abs(values[8] - 0.004) < 1e-4  # end of ramp (milestone 2*4=8)
    assert values[40] < 1e-5  # cosine annealed to ~eta_min
    assert max(values) <= 0.004 + 1e-9


def test_warmup_scheduler():
    cfg = ConfigDict({"optim.scheduler.WarmUpScheduler": {
        "base": 0.01, "warmup": {"learning_rate": 0.1, "length": 3},
        "main_scheduler": None, "iteration_unit": "epoch"}})
    spec = build_schedule(cfg, num_epochs=10)
    values = lr_seq(spec, 6)
    # the reference holds the warmup lr for length+1 units (its step()
    # only flips the phase when last_step == length) — pinned against the
    # actual reference in tests/test_scheduler_parity.py
    assert values[:4] == [pytest.approx(0.1)] * 4
    assert values[4:] == [pytest.approx(0.01)] * 2


def test_epoch_unit_conversion():
    cfg = ConfigDict({"optim.scheduler.StepLearningRateScheduler": {
        "base": 1.0, "learning_rates_dict": {1: 0.5},
        "iteration_unit": "epoch"}})
    spec = build_schedule(cfg)
    values = lr_seq(spec, 8, bpe=4)
    assert values[:4] == [1.0] * 4  # first epoch at base
    assert values[4:] == [0.5] * 4


def test_sgd_optimizer_matches_torch():
    torch = pytest.importorskip("torch")
    cfg = ConfigDict({"sgd": {
        "weight_decay": 0.0001, "momentum": 0.9,
        "learning_rate": {"constant": {"base": 0.05}},
        "nesterov_momentum": False, "momentum_dampening": 0.0}})
    opt = Optimizer(cfg, num_epochs=1, batches_per_epoch=1)
    w0 = np.array([1.0, -2.0, 3.0], np.float32)
    g = np.array([0.1, 0.2, -0.1], np.float32)

    params = {"w": jnp.asarray(w0)}
    state = opt.tx.init(params)
    for _ in range(3):
        updates, state = opt.tx.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)

    tw = torch.nn.Parameter(torch.tensor(w0))
    topt = torch.optim.SGD([tw], lr=0.05, momentum=0.9, weight_decay=0.0001)
    for _ in range(3):
        topt.zero_grad()
        tw.grad = torch.tensor(g)
        topt.step()
    np.testing.assert_allclose(np.asarray(params["w"]),
                               tw.detach().numpy(), rtol=1e-5)


def test_adamw_optimizer_matches_torch():
    torch = pytest.importorskip("torch")
    cfg = ConfigDict({"torch.optim.AdamW": {
        "learning_rate": {"constant": {"base": 0.004}},
        "betas": (0.9, 0.999), "weight_decay": 0.05}})
    opt = Optimizer(cfg, num_epochs=1, batches_per_epoch=1)
    w0 = np.array([1.0, -2.0, 3.0], np.float32)
    g = np.array([0.1, 0.2, -0.1], np.float32)

    params = {"w": jnp.asarray(w0)}
    state = opt.tx.init(params)
    for _ in range(5):
        updates, state = opt.tx.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)

    tw = torch.nn.Parameter(torch.tensor(w0))
    topt = torch.optim.AdamW([tw], lr=0.004, betas=(0.9, 0.999),
                             weight_decay=0.05)
    for _ in range(5):
        topt.zero_grad()
        tw.grad = torch.tensor(g)
        topt.step()
    np.testing.assert_allclose(np.asarray(params["w"]),
                               tw.detach().numpy(), rtol=1e-4, atol=1e-6)


def test_optimizer_freeze_mask():
    cfg = ConfigDict({"sgd": {"learning_rate": {"constant": {"base": 0.1}},
                              "momentum": 0.0, "weight_decay": 0.0}})
    mask = {"enc": {"w": False}, "dec": {"w": True}}
    opt = Optimizer(cfg, trainable_mask=mask)
    params = {"enc": {"w": jnp.ones(2)}, "dec": {"w": jnp.ones(2)}}
    state = opt.tx.init(params)
    grads = {"enc": {"w": jnp.ones(2)}, "dec": {"w": jnp.ones(2)}}
    updates, _ = opt.tx.update(grads, state, params)
    assert float(jnp.abs(updates["enc"]["w"]).sum()) == 0.0
    assert float(jnp.abs(updates["dec"]["w"]).sum()) > 0.0


def test_fill_kwargs_parity_with_reference_config():
    """The covidqu unet.yaml optimizer block resolves correctly."""
    cfg = ConfigDict({"sgd": {
        "weight_decay": 0.0001, "momentum": 0.9,
        "learning_rate": {"optim.scheduler.PolyLearningRateDecay": {
            "base": 0.05, "exponent": 0.9, "iteration_unit": "batch",
            "number_of_iterations": "auto", "last_epoch": -1}},
        "nesterov_momentum": False, "momentum_dampening": 0.0}})
    opt = Optimizer(cfg, num_epochs=150, batches_per_epoch=7)
    assert opt.schedule.unit == "batch"
    assert opt.schedule.base == 0.05
    assert float(opt.lr_at(jnp.asarray(0))) == pytest.approx(0.05)
    # the reference trajectory lags two steps, so lr hits 0 at N + 2
    assert float(opt.lr_at(jnp.asarray(150 * 7 + 2))) == pytest.approx(0.0)


def test_sgd_dampening_matches_torch_exactly():
    """torch seeds the momentum buffer with the UNDAMPENED first gradient;
    later steps use buf = m*buf + (1-d)*g."""
    import optax
    import torch

    from medsegpretrainimagenet_tpu.optim.optimizers import _sgd

    p = torch.nn.Parameter(torch.tensor([1.0]))
    opt = torch.optim.SGD([p], lr=0.1, momentum=0.9, dampening=0.1)
    grads = [1.0, 0.5, 0.25, 2.0]
    tvals = []
    for g in grads:
        opt.zero_grad()
        p.grad = torch.tensor([g])
        opt.step()
        tvals.append(float(p.data[0]))

    tx = _sgd(0.1, momentum=0.9, dampening=0.1)
    params = jnp.asarray([1.0])
    state = tx.init(params)
    jvals = []
    for g in grads:
        upd, state = tx.update(jnp.asarray([g]), state, params)
        params = optax.apply_updates(params, upd)
        jvals.append(float(params[0]))
    np.testing.assert_allclose(jvals, tvals, atol=1e-6)


def test_torch_adam_betas_are_honoured():
    """A config 'betas' pair must reach the adam transform (it was being
    swallowed by **_ignored, silently training with 0.9/0.999)."""
    import optax

    from medsegpretrainimagenet_tpu.optim.optimizers import _adam

    tx = _adam(0.1, betas=(0.5, 0.8))
    params = jnp.asarray([1.0])
    state = tx.init(params)
    _, state = tx.update(jnp.asarray([1.0]), state, params)
    _, state = tx.update(jnp.asarray([0.0]), state, params)
    mu = float(jax.tree_util.tree_leaves(state)[1][0])  # [0] is the count
    # first moment after g=1 then g=0 with b1: mu = b1*(1-b1)... second
    # update: mu2 = b1*mu1 = 0.5*0.5 = 0.25 (for b1=0.9: 0.09)
    assert abs(mu - 0.25) < 1e-6, mu


def test_amsgrad_matches_torch_adam_and_adamw():
    """amsgrad must actually be honored in every adam path (it used to be
    silently dropped for decoupled decay and the torch.optim aliases):
    trajectories with a shrinking-then-spiking gradient separate AMSGrad
    (max-v) from plain Adam and must match torch elementwise."""
    torch = pytest.importorskip("torch")
    w0 = np.array([1.0, -2.0, 3.0], np.float32)
    grads = [np.array([1.0, 1.5, -2.0], np.float32),
             np.array([0.01, 0.01, -0.01], np.float32),
             np.array([0.01, 0.01, -0.01], np.float32),
             np.array([2.0, -1.0, 1.0], np.float32),
             np.array([0.01, 0.01, -0.01], np.float32)]

    cases = [
        ({"torch.optim.Adam": {
            "learning_rate": {"constant": {"base": 0.01}},
            "betas": (0.9, 0.999), "weight_decay": 0.0, "amsgrad": True}},
         lambda p: torch.optim.Adam(p, lr=0.01, betas=(0.9, 0.999),
                                    amsgrad=True)),
        ({"torch.optim.AdamW": {
            "learning_rate": {"constant": {"base": 0.01}},
            "betas": (0.9, 0.999), "weight_decay": 0.05, "amsgrad": True}},
         lambda p: torch.optim.AdamW(p, lr=0.01, betas=(0.9, 0.999),
                                     weight_decay=0.05, amsgrad=True)),
        ({"adam": {
            "learning_rate": {"constant": {"base": 0.01}},
            "beta_1": 0.9, "beta_2": 0.999, "weight_decay": 0.05,
            "decoupled weight decay": True, "amsgrad": True}},
         lambda p: torch.optim.AdamW(p, lr=0.01, betas=(0.9, 0.999),
                                     weight_decay=0.05, amsgrad=True)),
    ]
    for cfg_dict, make_torch in cases:
        opt = Optimizer(ConfigDict(cfg_dict), num_epochs=1,
                        batches_per_epoch=1)
        params = {"w": jnp.asarray(w0)}
        state = opt.tx.init(params)
        for g in grads:
            updates, state = opt.tx.update({"w": jnp.asarray(g)}, state,
                                           params)
            params = optax.apply_updates(params, updates)

        tw = torch.nn.Parameter(torch.tensor(w0))
        topt = make_torch([tw])
        for g in grads:
            topt.zero_grad()
            tw.grad = torch.tensor(g)
            topt.step()
        np.testing.assert_allclose(np.asarray(params["w"]),
                                   tw.detach().numpy(), rtol=1e-4,
                                   atol=1e-6, err_msg=str(cfg_dict))
        # and that the trajectory differs from non-amsgrad (the knob is live)
        plain_key = next(iter(cfg_dict))
        plain_cfg = {plain_key: dict(cfg_dict[plain_key], amsgrad=False)}
        plain = Optimizer(ConfigDict(plain_cfg), num_epochs=1,
                          batches_per_epoch=1)
        p2 = {"w": jnp.asarray(w0)}
        s2 = plain.tx.init(p2)
        for g in grads:
            updates, s2 = plain.tx.update({"w": jnp.asarray(g)}, s2, p2)
            p2 = optax.apply_updates(p2, updates)
        assert np.abs(np.asarray(params["w"]) -
                      np.asarray(p2["w"])).max() > 1e-6


def test_warmup_omitted_key_defaults_enabled():
    """A missing 'warmup' key means warmup ENABLED with the reference
    PARAMS defaults {learning_rate: 0.1, length: 1} (scheduler.py:142-147
    via the fill machinery); only warmup: false/null disables it."""
    cfg = ConfigDict({"optim.scheduler.WarmUpScheduler": {
        "base": 0.01, "main_scheduler": None, "iteration_unit": "epoch"}})
    spec = build_schedule(cfg, num_epochs=10)
    values = lr_seq(spec, 4)
    # length 1 -> warmup lr 0.1 held for length+1 units, then base
    assert values[:2] == [pytest.approx(0.1)] * 2
    assert values[2:] == [pytest.approx(0.01)] * 2

    disabled = ConfigDict({"optim.scheduler.WarmUpScheduler": {
        "base": 0.01, "warmup": False, "main_scheduler": None,
        "iteration_unit": "epoch"}})
    spec2 = build_schedule(disabled, num_epochs=10)
    assert lr_seq(spec2, 3) == [pytest.approx(0.01)] * 3


def test_nested_auto_horizon_uses_sub_unit():
    """An epoch-unit WarmUpScheduler around a CosineAnnealingLR with
    T_max: auto: the cosine's horizon resolves in ITS default unit
    ('batch': (num_epochs - length) * bpe) while it is stepped once per
    epoch — so the lr stays near base, never annealing to eta_min
    (reference nested-constructor semantics, scheduler.py:190-196)."""
    num_epochs, bpe, length = 10, 5, 1
    cfg = ConfigDict({"optim.scheduler.WarmUpScheduler": {
        "base": 0.01, "warmup": {"learning_rate": 0.1, "length": length},
        "main_scheduler": {
            "torch.optim.lr_scheduler.CosineAnnealingLR":
                {"eta_min": 0.0, "T_max": "auto"}},
        "iteration_unit": "epoch"}})
    spec = build_schedule(cfg, num_epochs=num_epochs, batches_per_epoch=bpe)
    values = lr_seq(spec, num_epochs * bpe, bpe=bpe)
    # last epoch: main(num_epochs-1 - length) of a (9*5=45)-step cosine
    t_max = (num_epochs - length) * bpe
    expected_last = 0.01 * 0.5 * (
        1 + np.cos(np.pi * (num_epochs - 1 - length) / t_max))
    assert values[-1] == pytest.approx(expected_last, rel=1e-5)
    assert values[-1] > 0.008  # nowhere near eta_min


def test_step_lr_zero_milestone_is_dead():
    """A 0 milestone never fires: the reference's counter is incremented
    BEFORE the membership check (scheduler.py:336-338)."""
    cfg = ConfigDict({"optim.scheduler.StepLearningRateScheduler": {
        "base": 0.01, "learning_rates_dict": {0: 0.001, 2: 0.0001},
        "iteration_unit": "epoch"}})
    spec = build_schedule(cfg)
    values = lr_seq(spec, 4)
    assert values[:2] == [pytest.approx(0.01)] * 2   # 0-entry ignored
    assert values[2:] == [pytest.approx(0.0001)] * 2
