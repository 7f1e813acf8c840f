import numpy as np
import jax
import pytest

from vln_magic_tpu.config import ModelConfig
from vln_magic_tpu.models import DualScaleVLNBert
from vln_magic_tpu.models.vlnbert import dummy_step_batch
from vln_magic_tpu.utils.checkpoint import (CheckpointManager, flatten_params,
                                            load_torch_checkpoint,
                                            save_torch_checkpoint,
                                            unflatten_params)
from vln_magic_tpu.utils.hf_import import load_roberta_weights


@pytest.fixture(scope="module")
def small():
    cfg = ModelConfig(vocab_size=120, hidden_size=32, num_attention_heads=2,
                      num_l_layers=2, num_pano_layers=1, num_x_layers=1,
                      image_feat_size=16, max_position_embeddings=80,
                      kd_heads=True, kd_target_size=48)
    model = DualScaleVLNBert(cfg)
    params = model.init(jax.random.PRNGKey(0), dummy_step_batch(cfg))
    return cfg, model, params


def test_torch_roundtrip(tmp_path, small):
    cfg, model, params = small
    p = str(tmp_path / "ckpt.pt")
    save_torch_checkpoint(params, p, epoch=7)
    loaded, epoch, missing, unexpected = load_torch_checkpoint(p, template=params)
    assert epoch == 7 and not missing and not unexpected
    f0 = flatten_params(params)
    f1 = flatten_params(loaded)
    for k in f0:
        np.testing.assert_array_equal(f0[k], f1[k])


def test_torch_load_drops_kd_heads(tmp_path, small):
    cfg, model, params = small
    p = str(tmp_path / "ckpt.pt")
    save_torch_checkpoint(params, p)
    loaded, _, missing, unexpected = load_torch_checkpoint(
        p, template=params, drop_kd_heads=True)
    assert any("txt_emb_w" in m for m in missing)
    assert not unexpected
    # dropped heads keep the template values
    f0, f1 = flatten_params(params), flatten_params(loaded)
    kd_keys = [k for k in f0 if "txt_emb_w" in k]
    for k in kd_keys:
        np.testing.assert_array_equal(f0[k], f1[k])


def test_module_prefix_stripping(tmp_path, small):
    import torch

    cfg, model, params = small
    flat = flatten_params(params)
    sd = {"module." + k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in flat.items()}
    p = str(tmp_path / "ddp.pt")
    torch.save({"vln_bert": {"epoch": 1, "state_dict": sd}}, p)
    loaded, epoch, missing, unexpected = load_torch_checkpoint(p, template=params)
    assert not missing and not unexpected


def test_shape_mismatch_raises(tmp_path, small):
    import torch

    cfg, model, params = small
    flat = flatten_params(params)
    k0 = next(iter(flat))
    sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in flat.items()}
    sd[k0] = torch.zeros(3, 3)
    p = str(tmp_path / "bad.pt")
    torch.save({"vln_bert": {"epoch": 0, "state_dict": sd}}, p)
    with pytest.raises(ValueError, match="shape mismatch"):
        load_torch_checkpoint(p, template=params)


def test_orbax_manager(tmp_path, small):
    cfg, model, params = small
    mgr = CheckpointManager(str(tmp_path / "ckpts"))
    mgr.save_latest(params)
    assert mgr.has("latest")
    restored = mgr.restore("latest", template=params)
    f0, f1 = flatten_params(params), flatten_params(restored)
    for k in f0:
        np.testing.assert_array_equal(f0[k], f1[k])


def test_roberta_import(small):
    from transformers import RobertaConfig, RobertaModel

    cfg, model, params = small
    hf_cfg = RobertaConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        num_hidden_layers=4, num_attention_heads=cfg.num_attention_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings)
    hf = RobertaModel(hf_cfg)
    hf_state = {k: v.detach().numpy() for k, v in hf.state_dict().items()}

    new_params, loaded = load_roberta_weights(params, hf_state,
                                              cfg.num_l_layers, jump_init=True)
    assert len(loaded) > 20
    flat = flatten_params(new_params)
    # word embedding carried over
    np.testing.assert_allclose(
        flat["params.lang_encoder.word_embeddings.embedding"],
        hf_state["embeddings.word_embeddings.weight"], rtol=1e-6)
    # jump init: our layer 1 == HF layer 2 (transposed kernel)
    np.testing.assert_allclose(
        flat["params.lang_encoder.layer_1.attention.query.kernel"],
        hf_state["encoder.layer.2.attention.self.query.weight"].T, rtol=1e-6)
    # model still runs with the imported weights
    from vln_magic_tpu.models.vlnbert import dummy_step_batch

    outs = model.apply(new_params, dummy_step_batch(cfg))
    assert np.isfinite(np.asarray(outs["cls_embeds"])).all()


def test_pretrain_to_nav_weight_flow(tmp_path):
    """Pretrain one step, export .pt, load the trunk into the navigator via
    the bert. prefix key map (the --bert_ckpt_file flow, parser.py:44)."""
    import numpy as np

    from vln_magic_tpu.config import (EnvConfig, MagicConfig, ModelConfig,
                                      TrainConfig)
    from vln_magic_tpu.agent import Navigator
    from vln_magic_tpu.env import make_synthetic_world
    from vln_magic_tpu.env.synthetic import make_synthetic_instructions
    from vln_magic_tpu.pretrain.trainer import PretrainTrainer
    from vln_magic_tpu.utils.checkpoint import pretrain_to_nav_key_map

    world = make_synthetic_world(num_scans=1, nodes_per_scan=14, feat_dim=16,
                                 seed=61)
    mcfg = ModelConfig(vocab_size=300, hidden_size=32, num_attention_heads=2,
                       num_l_layers=1, num_pano_layers=1, num_x_layers=1,
                       image_feat_size=16, max_position_embeddings=80)
    cfg = MagicConfig(model=mcfg, env=EnvConfig(max_instr_len=32,
                                                max_action_len=4,
                                                max_gmap_len=16),
                      train=TrainConfig(batch_size=4))
    items = make_synthetic_instructions(world, 8, np.random.default_rng(9),
                                        vocab_size=300, min_path=2, max_path=4)
    pt = PretrainTrainer(cfg, world, image_prob_size=20,
                         builder_kwargs=dict(max_steps=4, max_gmap=16,
                                             max_txt=32))
    pt.fit(items, iters=1)
    p = str(tmp_path / "model_step_1.pt")
    save_torch_checkpoint(pt.params, p, epoch=1)

    nav = Navigator(cfg, world, rng=jax.random.PRNGKey(5))
    loaded, _, missing, unexpected = load_torch_checkpoint(
        p, template=nav.params, key_map=pretrain_to_nav_key_map)
    # the trunk must fully transfer (no missing nav params)
    assert not missing, missing
    assert not unexpected, unexpected
    # word embedding actually carried over
    from vln_magic_tpu.utils.checkpoint import flatten_params

    f_pre = flatten_params(pt.params)
    f_nav = flatten_params(loaded)
    np.testing.assert_array_equal(
        f_pre["params.bert.lang_encoder.word_embeddings.embedding"],
        f_nav["params.lang_encoder.word_embeddings.embedding"])
    nav.params = loaded
    (avg, _), _ = nav.evaluate(items[:4], batch_size=4)
    assert np.isfinite(avg["nDTW"])


def test_meter_import_populates_cross_encoders(small):
    """METER-shaped state dict -> lang stack + BOTH cross-modal encoders'
    crossattention/self/FFN kernels, by value (the reference remap prefixes
    bert.{local,global}_encoder.encoder.crossattention,
    train_r2r_magic.py:190-254)."""
    from vln_magic_tpu.utils.hf_import import load_meter_weights

    cfg, model, params = small
    h, ffn = cfg.hidden_size, cfg.intermediate_size
    rng = np.random.default_rng(0)
    sd = {}
    # text transformer stack (roberta-shaped)
    sd["text_transformer.embeddings.word_embeddings.weight"] = \
        rng.standard_normal((cfg.vocab_size, h)).astype(np.float32)
    for i in range(cfg.num_l_layers):
        s = f"text_transformer.encoder.layer.{i}"
        for n in ("query", "key", "value"):
            sd[f"{s}.attention.self.{n}.weight"] = rng.standard_normal(
                (h, h)).astype(np.float32)
            sd[f"{s}.attention.self.{n}.bias"] = np.zeros(h, np.float32)
        sd[f"{s}.attention.output.dense.weight"] = rng.standard_normal(
            (h, h)).astype(np.float32)
        sd[f"{s}.attention.output.dense.bias"] = np.zeros(h, np.float32)
        sd[f"{s}.attention.output.LayerNorm.weight"] = np.ones(h, np.float32)
        sd[f"{s}.attention.output.LayerNorm.bias"] = np.zeros(h, np.float32)
        sd[f"{s}.intermediate.dense.weight"] = rng.standard_normal(
            (ffn, h)).astype(np.float32)
        sd[f"{s}.intermediate.dense.bias"] = np.zeros(ffn, np.float32)
        sd[f"{s}.output.dense.weight"] = rng.standard_normal(
            (h, ffn)).astype(np.float32)
        sd[f"{s}.output.dense.bias"] = np.zeros(h, np.float32)
        sd[f"{s}.output.LayerNorm.weight"] = np.ones(h, np.float32)
        sd[f"{s}.output.LayerNorm.bias"] = np.zeros(h, np.float32)
    # cross-modal image + text layers (BertCrossLayer-shaped)
    for i in range(cfg.num_x_layers):
        for stack, attns in (("cross_modal_image_layers",
                              ("attention", "crossattention")),
                             ("cross_modal_text_layers", ("crossattention",))):
            s = f"{stack}.{i}"
            for attn in attns:
                for n in ("query", "key", "value"):
                    sd[f"{s}.{attn}.self.{n}.weight"] = rng.standard_normal(
                        (h, h)).astype(np.float32)
                    sd[f"{s}.{attn}.self.{n}.bias"] = np.zeros(h, np.float32)
                sd[f"{s}.{attn}.output.dense.weight"] = rng.standard_normal(
                    (h, h)).astype(np.float32)
                sd[f"{s}.{attn}.output.dense.bias"] = np.zeros(h, np.float32)
                sd[f"{s}.{attn}.output.LayerNorm.weight"] = np.ones(h, np.float32)
                sd[f"{s}.{attn}.output.LayerNorm.bias"] = np.zeros(h, np.float32)
            if stack == "cross_modal_image_layers":
                sd[f"{s}.intermediate.dense.weight"] = rng.standard_normal(
                    (ffn, h)).astype(np.float32)
                sd[f"{s}.intermediate.dense.bias"] = np.zeros(ffn, np.float32)
                sd[f"{s}.output.dense.weight"] = rng.standard_normal(
                    (h, ffn)).astype(np.float32)
                sd[f"{s}.output.dense.bias"] = np.zeros(h, np.float32)
                sd[f"{s}.output.LayerNorm.weight"] = np.ones(h, np.float32)
                sd[f"{s}.output.LayerNorm.bias"] = np.zeros(h, np.float32)

    new_params, loaded, skipped = load_meter_weights(
        params, sd, cfg.num_l_layers, cfg.num_x_layers)
    flat = flatten_params(new_params)
    # both encoders' crossattention kernels carry the METER values exactly
    for enc in ("local_encoder", "global_encoder"):
        np.testing.assert_allclose(
            flat[f"params.{enc}.layer_0.crossattention.query.kernel"],
            sd["cross_modal_image_layers.0.crossattention.self.query.weight"].T,
            rtol=1e-6)
        np.testing.assert_allclose(
            flat[f"params.{enc}.layer_0.self_attention.value.kernel"],
            sd["cross_modal_image_layers.0.attention.self.value.weight"].T,
            rtol=1e-6)
        np.testing.assert_allclose(
            flat[f"params.{enc}.layer_0.ffn.intermediate.kernel"],
            sd["cross_modal_image_layers.0.intermediate.dense.weight"].T,
            rtol=1e-6)
        np.testing.assert_allclose(
            flat[f"params.{enc}.layer_0.lang2visn_attention.query.kernel"],
            sd["cross_modal_text_layers.0.crossattention.self.query.weight"].T,
            rtol=1e-6)
    np.testing.assert_allclose(
        flat["params.lang_encoder.word_embeddings.embedding"],
        sd["text_transformer.embeddings.word_embeddings.weight"], rtol=1e-6)
    assert len(loaded) > 30


def test_exact_path_merge_never_suffix_matches(small):
    """merge_mapped_weights must not place a tensor whose relative path only
    suffix-matches a model path (the round-1 endswith hazard)."""
    from vln_magic_tpu.utils.hf_import import merge_mapped_weights

    cfg, model, params = small
    bogus = {"definitely.not.a.real.module.query.kernel":
             np.zeros((cfg.hidden_size, cfg.hidden_size), np.float32)}
    _, loaded, skipped = merge_mapped_weights(params, bogus)
    assert not loaded and skipped
