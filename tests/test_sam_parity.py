"""SAM golden parity vs the torch reference modules (random weights both
sides, imported through vit/sam/weights.py): image encoder (windowed +
global rel-pos attention, neck), prompt encoder (random-Fourier PE, point
embeddings), mask decoder (two-way transformer, upscaling, hypernetworks,
IoU head) — reference vit/sam/modules/{encoders,decoders,transformer}.py.
Plus a full sam_b state_dict name-coverage check."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from mgdt_yolo_tpu.vit.sam.modules import (ImageEncoderViT, MaskDecoder,
                                           PromptEncoder)
from mgdt_yolo_tpu.vit.sam.weights import load_sam_state_dict
from reference_harness import import_reference

D = 32  # tiny embed dim for value parity


def _import(flax_vars, torch_mod):
    sd = {k: v.detach().numpy() for k, v in torch_mod.state_dict().items()}
    vars2, rep = load_sam_state_dict({"params": dict(flax_vars["params"])},
                                     sd, verbose=False)
    assert not rep["name_missed"], rep["name_missed"][:8]
    assert not rep["shape_missed"], rep["shape_missed"][:8]
    return vars2


class TestImageEncoderParity:
    def test_tiny_encoder(self):
        import_reference()
        from ultralytics.vit.sam.modules.encoders import (
            ImageEncoderViT as TEnc)
        torch.manual_seed(0)
        tenc = TEnc(img_size=64, patch_size=16, embed_dim=D, depth=2,
                    num_heads=2, out_chans=16, window_size=14,
                    global_attn_indexes=(1,), use_rel_pos=True)
        tenc.eval()
        # give the zero-init rel-pos/pos tables real values
        with torch.no_grad():
            for n, p in tenc.named_parameters():
                if "rel_pos" in n or "pos_embed" in n:
                    p.copy_(torch.randn_like(p) * 0.05)
        enc = ImageEncoderViT(img_size=64, patch_size=16, embed_dim=D,
                              depth=2, num_heads=2, out_chans=16,
                              window_size=14, global_attn_indexes=(1,))
        rng = np.random.default_rng(0)
        x = rng.uniform(-1, 1, (1, 3, 64, 64)).astype(np.float32)
        xn = jnp.asarray(x.transpose(0, 2, 3, 1))
        variables = _import(enc.init(jax.random.PRNGKey(0), xn), tenc)
        with torch.no_grad():
            want = tenc(torch.from_numpy(x)).numpy()  # (1, 16, 4, 4)
        got = np.asarray(enc.apply(variables, xn)).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, want, atol=2e-4)


class TestPromptEncoderParity:
    def test_points(self):
        import_reference()
        from ultralytics.vit.sam.modules.encoders import (
            PromptEncoder as TPrompt)
        torch.manual_seed(1)
        tp = TPrompt(embed_dim=D, image_embedding_size=(4, 4),
                     input_image_size=(64, 64), mask_in_chans=4)
        tp.eval()
        pe = PromptEncoder(embed_dim=D, image_embedding_size=(4, 4),
                           input_image_size=(64, 64))
        pts = np.array([[[10.0, 20.0], [50.0, 40.0]]], np.float32)
        lbl = np.array([[1, 0]], np.int32)
        variables = _import(
            pe.init(jax.random.PRNGKey(0), points=jnp.asarray(pts),
                    labels=jnp.asarray(lbl)), tp)
        with torch.no_grad():
            sp_t, dn_t = tp(points=(torch.from_numpy(pts),
                                    torch.from_numpy(lbl.astype(np.int64))),
                            boxes=None, masks=None)
            pe_t = tp.get_dense_pe()
        sp, dn = pe.apply(variables, points=jnp.asarray(pts),
                          labels=jnp.asarray(lbl))
        np.testing.assert_allclose(np.asarray(sp), sp_t.detach().numpy(), atol=1e-4)
        np.testing.assert_allclose(np.asarray(dn).transpose(0, 3, 1, 2),
                                   dn_t.detach().numpy(), atol=1e-5)
        dpe = pe.apply(variables, method=PromptEncoder.get_dense_pe)
        np.testing.assert_allclose(np.asarray(dpe).transpose(2, 0, 1),
                                   pe_t.detach().numpy()[0], atol=1e-4)


class TestMaskDecoderParity:
    def test_decoder(self):
        import_reference()
        from ultralytics.vit.sam.modules.decoders import MaskDecoder as TDec
        from ultralytics.vit.sam.modules.transformer import TwoWayTransformer
        torch.manual_seed(2)
        tdec = TDec(transformer_dim=D,
                    transformer=TwoWayTransformer(depth=2, embedding_dim=D,
                                                  mlp_dim=2048, num_heads=8),
                    num_multimask_outputs=3, iou_head_depth=3,
                    iou_head_hidden_dim=256)
        tdec.eval()
        dec = MaskDecoder(transformer_dim=D)
        rng = np.random.default_rng(3)
        emb = rng.uniform(-1, 1, (1, D, 4, 4)).astype(np.float32)
        pe_img = rng.uniform(-1, 1, (1, D, 4, 4)).astype(np.float32)
        sparse = rng.uniform(-1, 1, (1, 2, D)).astype(np.float32)
        dense = rng.uniform(-1, 1, (1, D, 4, 4)).astype(np.float32)
        variables = _import(dec.init(
            jax.random.PRNGKey(0),
            jnp.asarray(emb.transpose(0, 2, 3, 1)),
            jnp.asarray(pe_img.transpose(0, 2, 3, 1)),
            jnp.asarray(sparse), jnp.asarray(dense.transpose(0, 2, 3, 1))), tdec)
        with torch.no_grad():
            m_t, iou_t = tdec(
                image_embeddings=torch.from_numpy(emb),
                image_pe=torch.from_numpy(pe_img),
                sparse_prompt_embeddings=torch.from_numpy(sparse),
                dense_prompt_embeddings=torch.from_numpy(dense),
                multimask_output=True)
        m, iou = dec.apply(variables,
                           jnp.asarray(emb.transpose(0, 2, 3, 1)),
                           jnp.asarray(pe_img.transpose(0, 2, 3, 1)),
                           jnp.asarray(sparse),
                           jnp.asarray(dense.transpose(0, 2, 3, 1)),
                           multimask_output=True)
        np.testing.assert_allclose(np.asarray(iou), iou_t.numpy(), atol=2e-4)
        np.testing.assert_allclose(np.asarray(m), m_t.numpy(), atol=2e-3)


class TestSamBNameCoverage:
    def test_full_sam_b_state_dict_lands(self):
        """Every sam_b torch key (minus the unimplemented mask-prompt
        downscaling tower) must land in the flax tree with matching shape
        (reference build.py:20-129)."""
        import_reference()
        from ultralytics.vit.sam.build import build_sam_vit_b
        torch.manual_seed(0)
        ref = build_sam_vit_b()
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

        from mgdt_yolo_tpu.vit.sam.model import SAM
        sam = SAM("sam_b", img_size=1024)
        rep = sam.load(sd)
        assert not rep["name_missed"], rep["name_missed"][:10]
        assert not rep["shape_missed"], rep["shape_missed"][:10]
        assert rep["matched"] > 250, rep["matched"]
