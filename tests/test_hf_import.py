"""HF checkpoint importer vs a synthetic torch-style state dict.

Builds a state dict with the exact naming/packing conventions of the HF
Caduceus remote code + mamba_ssm (RCPS wrappers, BiMamba fwd/rev with tied
in/out projections, packed in_proj [2di, d] and x_proj [R+2N, di] row
layouts, depthwise conv [di, 1, K]) and checks that the imported pytree
reproduces the golden model's forward — guarding every transpose/split the
importer performs (the silent-failure hazard of SURVEY.md §7.3).
"""

import json

import numpy as np
import pytest

from plantcaduceus_tpu.compat import hf_import
from plantcaduceus_tpu.models.config import CaduceusConfig

TINY = dict(d_model=16, n_layer=2, vocab_size=16, d_state=4, expand=2, d_conv=4)


def make_state_dict(cfg, rng):
    d, di, N, R, K = (cfg.d_model, cfg.d_inner, cfg.d_state, cfg.dt_rank,
                      cfg.d_conv)
    V = cfg.vocab_size
    sd = {}
    r = lambda *s: rng.standard_normal(s).astype(np.float32) * 0.3

    sd["caduceus.backbone.embeddings.word_embeddings.embedding.weight"] = r(V, d)
    for i in range(cfg.n_layer):
        base = f"caduceus.backbone.layers.{i}"
        sd[f"{base}.norm.submodule.weight"] = 1 + 0.1 * r(d)
        in_w = r(2 * di, d)
        out_w = r(d, di)
        for dir_ in ("mamba_fwd", "mamba_rev"):
            m = f"{base}.mixer.submodule.{dir_}"
            # tied in/out projections: identical tensors under both names
            sd[f"{m}.in_proj.weight"] = in_w
            sd[f"{m}.out_proj.weight"] = out_w
            sd[f"{m}.conv1d.weight"] = r(di, 1, K)
            sd[f"{m}.conv1d.bias"] = r(di)
            sd[f"{m}.x_proj.weight"] = r(R + 2 * N, di)
            sd[f"{m}.dt_proj.weight"] = r(di, R)
            sd[f"{m}.dt_proj.bias"] = r(di)
            sd[f"{m}.A_log"] = np.log(
                np.tile(np.arange(1, N + 1, dtype=np.float32), (di, 1)))
            sd[f"{m}.D"] = 1 + 0.1 * r(di)
    sd["caduceus.backbone.norm_f.submodule.weight"] = 1 + 0.1 * r(d)
    return sd


@pytest.fixture
def hf_dir(tmp_path, rng):
    cfg = CaduceusConfig(**TINY)
    sd = make_state_dict(cfg, rng)
    import torch

    torch.save({k: torch.from_numpy(v) for k, v in sd.items()},
               tmp_path / "pytorch_model.bin")
    (tmp_path / "config.json").write_text(json.dumps({
        "d_model": cfg.d_model, "n_layer": cfg.n_layer,
        "vocab_size": cfg.vocab_size,
        "ssm_cfg": {"d_state": cfg.d_state, "d_conv": cfg.d_conv,
                    "expand": cfg.expand},
        "rcps": True, "bidirectional": True,
        "bidirectional_strategy": "add", "bidirectional_weight_tie": True,
        "complement_map": {str(i): c for i, c in
                           enumerate(cfg.complement_map)},
        "rms_norm": True, "norm_epsilon": 1e-5,
        "tie_word_embeddings": True,
    }))
    return tmp_path, cfg, sd


def test_import_layout(hf_dir):
    path, cfg, sd = hf_dir
    params, cfg2 = hf_import.import_params(path)
    assert cfg2.d_model == cfg.d_model and cfg2.rcps
    di = cfg.d_inner
    b = params["blocks"]
    # tied projections collapse to Gio=1
    assert b["in_proj_x"].shape == (cfg.n_layer, 1, cfg.d_model, di)
    assert b["out_proj"].shape == (cfg.n_layer, 1, di, cfg.d_model)
    # x row-split: first di rows of torch in_proj
    w0 = sd["caduceus.backbone.layers.0.mixer.submodule.mamba_fwd.in_proj.weight"]
    np.testing.assert_allclose(np.asarray(b["in_proj_x"][0, 0]), w0[:di].T)
    np.testing.assert_allclose(np.asarray(b["in_proj_z"][0, 0]), w0[di:].T)
    # x_proj rows: dt, B, C
    xp = sd["caduceus.backbone.layers.0.mixer.submodule.mamba_fwd.x_proj.weight"]
    R, N = cfg.dt_rank, cfg.d_state
    np.testing.assert_allclose(np.asarray(b["x_proj_dt"][0, 0]), xp[:R].T)
    np.testing.assert_allclose(np.asarray(b["x_proj_B"][0, 0]), xp[R:R + N].T)
    np.testing.assert_allclose(np.asarray(b["x_proj_C"][0, 0]), xp[R + N:].T)
    # conv squeeze
    cw = sd["caduceus.backbone.layers.0.mixer.submodule.mamba_fwd.conv1d.weight"]
    np.testing.assert_allclose(np.asarray(b["conv_w"][0, 0]), cw[:, 0, :])
    # dt transpose
    dw = sd["caduceus.backbone.layers.0.mixer.submodule.mamba_fwd.dt_proj.weight"]
    np.testing.assert_allclose(np.asarray(b["dt_proj_w"][0, 0]), dw.T)


def test_imported_forward_matches_golden(hf_dir, rng):
    import jax
    import jax.numpy as jnp

    from plantcaduceus_tpu.models import caduceus
    from tests import golden

    path, cfg, _ = hf_dir
    params, cfg2 = hf_import.import_params(path)
    ids = jnp.asarray(rng.integers(7, 11, size=(1, 24)), jnp.int32)
    out = caduceus.forward(params, ids, cfg2, dtype=jnp.float32,
                           output_hidden_states=True)
    np_params = jax.tree.map(lambda a: np.asarray(a, np.float64), params)
    want_logits, want_hidden = golden.caduceus_forward_ref(
        np.asarray(ids[0]), np_params, cfg2)
    np.testing.assert_allclose(np.asarray(out["logits"][0]), want_logits,
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["hidden_states"][0]),
                               want_hidden, rtol=2e-4, atol=2e-4)


def test_untied_directions(tmp_path, rng):
    """Distinct fwd/rev in/out projections must keep the G axis."""
    import torch

    cfg = CaduceusConfig(**TINY)
    sd = make_state_dict(cfg, rng)
    for i in range(cfg.n_layer):
        m = f"caduceus.backbone.layers.{i}.mixer.submodule.mamba_rev"
        sd[f"{m}.in_proj.weight"] = sd[f"{m}.in_proj.weight"] + 1.0
        sd[f"{m}.out_proj.weight"] = sd[f"{m}.out_proj.weight"] + 1.0
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()},
               tmp_path / "pytorch_model.bin")
    (tmp_path / "config.json").write_text(json.dumps({
        "d_model": cfg.d_model, "n_layer": cfg.n_layer,
        "vocab_size": cfg.vocab_size, "rcps": True,
        "bidirectional_weight_tie": False,
        "ssm_cfg": {"d_state": cfg.d_state},
    }))
    params, cfg2 = hf_import.import_params(tmp_path)
    assert params["blocks"]["in_proj_x"].shape[1] == 2


def _save(tmp_path, sd, cfg):
    import torch

    torch.save({k: torch.from_numpy(v) for k, v in sd.items()},
               tmp_path / "pytorch_model.bin")
    (tmp_path / "config.json").write_text(json.dumps({
        "d_model": cfg.d_model, "n_layer": cfg.n_layer,
        "vocab_size": cfg.vocab_size, "rcps": True,
        "ssm_cfg": {"d_state": cfg.d_state, "d_conv": cfg.d_conv,
                    "expand": cfg.expand},
    }))
    return tmp_path


def test_strict_rejects_extra_key(tmp_path, rng):
    """A stray tensor the mapping never consumes must fail, naming the key."""
    cfg = CaduceusConfig(**TINY)
    sd = make_state_dict(cfg, rng)
    sd["caduceus.backbone.layers.0.mixer.submodule.mystery.weight"] = (
        np.zeros((3, 3), np.float32))
    with pytest.raises(ValueError, match="mystery"):
        hf_import.import_params(_save(tmp_path, sd, cfg))
    # non-strict tolerates it
    hf_import.import_params(_save(tmp_path, sd, cfg), strict=False)


def test_strict_rejects_renamed_key(tmp_path, rng):
    """A renamed tensor fails twice over: missing at its site AND stray."""
    cfg = CaduceusConfig(**TINY)
    sd = make_state_dict(cfg, rng)
    for dir_ in ("mamba_fwd", "mamba_rev"):
        m = f"caduceus.backbone.layers.1.mixer.submodule.{dir_}"
        sd[f"{m}.dt_projection.weight"] = sd.pop(f"{m}.dt_proj.weight")
    with pytest.raises((KeyError, ValueError), match="dt_proj"):
        hf_import.import_params(_save(tmp_path, sd, cfg))


def test_strict_rejects_transposed_tensor(tmp_path, rng):
    """A transposed x_proj lands as the wrong leaf shape -> loud failure."""
    cfg = CaduceusConfig(**TINY)
    sd = make_state_dict(cfg, rng)
    for i in range(cfg.n_layer):
        for dir_ in ("mamba_fwd", "mamba_rev"):
            m = f"caduceus.backbone.layers.{i}.mixer.submodule.{dir_}"
            sd[f"{m}.x_proj.weight"] = sd[f"{m}.x_proj.weight"].T.copy()
    with pytest.raises(ValueError, match="x_proj"):
        hf_import.import_params(_save(tmp_path, sd, cfg))


def test_ambiguous_key_is_fatal(tmp_path, rng):
    """Two keys matching one lookup pattern must raise, not shortest-match."""
    cfg = CaduceusConfig(**TINY)
    sd = make_state_dict(cfg, rng)
    sd["caduceus.backbone.norm_f.extra.norm_f.weight"] = np.ones(
        cfg.d_model, np.float32)
    with pytest.raises(KeyError, match="refusing to guess"):
        hf_import.import_params(_save(tmp_path, sd, cfg))


def test_strict_rejects_wrong_config_width(tmp_path, rng):
    """Config/weights disagreement (wrong d_model) cannot import silently."""
    cfg = CaduceusConfig(**TINY)
    sd = make_state_dict(cfg, rng)
    path = _save(tmp_path, sd, cfg)
    bad = json.loads((path / "config.json").read_text())
    bad["d_model"] = cfg.d_model * 2
    (path / "config.json").write_text(json.dumps(bad))
    with pytest.raises((ValueError, KeyError)):
        hf_import.import_params(path)


def test_audit_clean_checkpoint(hf_dir):
    """Dry audit of a clean checkpoint: ok=True, full ledger, no strays."""
    path, cfg, sd = hf_dir
    report = hf_import.audit(path)
    assert report["ok"] is True
    assert report["n_tensors"] == len(sd)
    assert report["stray"] == {}
    assert report["shape_mismatches"] == []
    assert report["tied_in_out_proj"] is True
    # every non-buffer state-dict tensor appears in the consumed ledger
    assert set(report["consumed"]) == set(sd)
    # shape table covers the whole pytree incl. stacked block leaves
    assert report["shapes"]["blocks.A_log"]["got"] == (
        cfg.n_layer, 2, cfg.d_inner, cfg.d_state)


def test_audit_reports_instead_of_raising(tmp_path, rng):
    """Stray + renamed tensors land in the report; audit never raises."""
    cfg = CaduceusConfig(**TINY)
    sd = make_state_dict(cfg, rng)
    sd["caduceus.backbone.layers.0.mixer.submodule.mystery.weight"] = (
        np.zeros((3, 3), np.float32))
    for dir_ in ("mamba_fwd", "mamba_rev"):
        m = f"caduceus.backbone.layers.1.mixer.submodule.{dir_}"
        sd[f"{m}.dt_projection.weight"] = sd.pop(f"{m}.dt_proj.weight")
    report = hf_import.audit(_save(tmp_path, sd, cfg))
    assert report["ok"] is False
    # the mapping failure is captured, naming the missing site
    assert "dt_proj" in report.get("error", "")
    # consumed/unconsumed ledgers still emitted for forensics
    assert any("mystery" in k for k in report["stray"])
    assert report["consumed"]  # layer 0 mapped before the failure


def test_audit_unreadable_dir(tmp_path):
    report = hf_import.audit(tmp_path / "nope")
    assert report["ok"] is False and "error" in report


def test_export_import_roundtrip(tmp_path, rng):
    """export_hf_dir -> import_params must reproduce params and forward."""
    import jax
    import jax.numpy as jnp

    from plantcaduceus_tpu.compat.hf_export import export_hf_dir
    from plantcaduceus_tpu.models import caduceus

    cfg = CaduceusConfig(**TINY)
    params = caduceus.init_params(jax.random.PRNGKey(3), cfg)
    export_hf_dir(tmp_path / "exp", params, cfg)
    params2, cfg2 = hf_import.import_params(tmp_path / "exp")
    assert cfg2.d_model == cfg.d_model and cfg2.rcps == cfg.rcps
    for (p1, l1), (p2, l2) in zip(
            jax.tree_util.tree_leaves_with_path(params),
            jax.tree_util.tree_leaves_with_path(params2)):
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-6,
                                   err_msg=jax.tree_util.keystr(p1))
    ids = jnp.asarray(rng.integers(7, 11, size=(1, 16)), jnp.int32)
    o1 = caduceus.forward(params, ids, cfg, dtype=jnp.float32)["logits"]
    o2 = caduceus.forward(params2, ids, cfg2, dtype=jnp.float32)["logits"]
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), rtol=1e-5)


def test_export_import_roundtrip_mamba2(tmp_path, rng):
    """The SSD (Mamba-2) family round-trips through the mamba_ssm Mamba2
    torch packing (in_proj rows [z|x|B|C|dt], conv1d over [x|B|C], per-head
    dt_bias/A_log/D, gated norm): params and forward identical, strict
    bijection holds, and the config re-derives the variant."""
    import jax
    import jax.numpy as jnp

    from plantcaduceus_tpu.compat.hf_export import export_hf_dir
    from plantcaduceus_tpu.models import caduceus

    cfg = CaduceusConfig(d_model=32, n_layer=2, vocab_size=16,
                         ssm_variant="mamba2", d_state=8, head_dim=16,
                         chunk_size=32)
    params = caduceus.init_params(jax.random.PRNGKey(3), cfg)
    export_hf_dir(tmp_path / "exp", params, cfg)
    params2, cfg2 = hf_import.import_params(tmp_path / "exp")
    assert cfg2.ssm_variant == "mamba2"
    assert (cfg2.head_dim, cfg2.n_groups, cfg2.chunk_size, cfg2.d_state) == \
        (cfg.head_dim, cfg.n_groups, cfg.chunk_size, cfg.d_state)
    assert set(params2["blocks"]) == set(params["blocks"])
    for k in params["blocks"]:
        np.testing.assert_allclose(np.asarray(params["blocks"][k]),
                                   np.asarray(params2["blocks"][k]),
                                   rtol=1e-6, err_msg=k)
    ids = jnp.asarray(rng.integers(7, 11, size=(1, 32)), jnp.int32)
    o1 = caduceus.forward(params, ids, cfg, dtype=jnp.float32)["logits"]
    o2 = caduceus.forward(params2, ids, cfg2, dtype=jnp.float32)["logits"]
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), rtol=1e-5)

    # the audit bijection holds for the mamba2 layout too
    report = hf_import.audit(tmp_path / "exp")
    assert report["ok"] and not report["stray"]


def test_mamba2_export_reloads_through_model_loading(tmp_path, rng):
    """An exported SSD checkpoint loads back through the standard CLI model
    resolution (utils.model_loading), so distilled/trained -ssd models are
    first-class citizens of every -model flag."""
    import jax

    from plantcaduceus_tpu.compat.hf_export import export_hf_dir
    from plantcaduceus_tpu.models import caduceus
    from plantcaduceus_tpu.utils.model_loading import load_model_and_tokenizer

    cfg = CaduceusConfig(d_model=32, n_layer=2, vocab_size=16,
                         ssm_variant="mamba2", d_state=8, head_dim=16,
                         chunk_size=32)
    params = caduceus.init_params(jax.random.PRNGKey(0), cfg)
    export_hf_dir(tmp_path / "ssd", params, cfg)
    p2, cfg2, tok = load_model_and_tokenizer(str(tmp_path / "ssd"))
    assert cfg2.ssm_variant == "mamba2"
    assert set(p2["blocks"]) == set(params["blocks"])
