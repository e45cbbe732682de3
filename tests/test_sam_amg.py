"""SAM automatic-mask-generation utilities parity vs the reference amg.py
(point grids, crop boxes, stability score, RLE round-trip, small-region
cleanup, mask->box)."""
import numpy as np
import pytest
import torch

from mgdt_yolo_tpu.vit.sam import amg
from reference_harness import import_reference


@pytest.fixture(scope="module")
def ref_amg():
    import_reference()
    from ultralytics.vit.sam import amg as ref
    return ref


class TestAmgParity:
    def test_point_grids(self, ref_amg):
        np.testing.assert_allclose(amg.build_point_grid(8),
                                   ref_amg.build_point_grid(8))
        for a, b in zip(amg.build_all_layer_point_grids(32, 2, 2),
                        ref_amg.build_all_layer_point_grids(32, 2, 2)):
            np.testing.assert_allclose(a, b)

    def test_crop_boxes(self, ref_amg):
        got = amg.generate_crop_boxes((480, 640), 2, 512 / 1500)
        want = ref_amg.generate_crop_boxes((480, 640), 2, 512 / 1500)
        assert got[0] == want[0] and got[1] == want[1]

    def test_stability_score(self, ref_amg):
        rng = np.random.default_rng(0)
        logits = rng.normal(0, 2, (5, 32, 32)).astype(np.float32)
        got = amg.calculate_stability_score(logits, 0.0, 1.0)
        want = ref_amg.calculate_stability_score(
            torch.from_numpy(logits), 0.0, 1.0).numpy()
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_rle_roundtrip(self, ref_amg):
        rng = np.random.default_rng(1)
        mask = rng.random((17, 23)) > 0.6
        rle = amg.mask_to_rle(mask)
        want_rle = ref_amg.mask_to_rle_pytorch(
            torch.from_numpy(mask[None]))[0]
        assert rle["counts"] == want_rle["counts"]
        np.testing.assert_array_equal(amg.rle_to_mask(rle), mask)
        assert amg.area_from_rle(rle) == int(mask.sum())

    def test_remove_small_regions(self, ref_amg):
        mask = np.zeros((32, 32), bool)
        mask[2:20, 2:20] = True
        mask[25:27, 25:27] = True   # small island
        mask[10:12, 10:12] = False  # small hole
        got_i, chg_i = amg.remove_small_regions(mask, 16, "islands")
        want_i, wchg_i = ref_amg.remove_small_regions(mask.copy(), 16, "islands")
        np.testing.assert_array_equal(got_i, want_i)
        assert chg_i == wchg_i
        got_h, chg_h = amg.remove_small_regions(mask, 16, "holes")
        want_h, wchg_h = ref_amg.remove_small_regions(mask.copy(), 16, "holes")
        np.testing.assert_array_equal(got_h, want_h)
        assert chg_h == wchg_h

    def test_batched_mask_to_box(self, ref_amg):
        masks = np.zeros((3, 16, 16), bool)
        masks[0, 2:5, 3:9] = True
        masks[1, 0:16, 0:1] = True
        got = amg.batched_mask_to_box(masks)
        want = ref_amg.batched_mask_to_box(torch.from_numpy(masks)).numpy()
        np.testing.assert_array_equal(got, want)

    def test_is_box_near_crop_edge(self, ref_amg):
        boxes = np.array([[0, 0, 50, 50], [100, 100, 200, 200]], np.float32)
        got = amg.is_box_near_crop_edge(boxes, [0, 0, 210, 210],
                                        [0, 0, 640, 640])
        want = ref_amg.is_box_near_crop_edge(
            torch.from_numpy(boxes), [0, 0, 210, 210],
            [0, 0, 640, 640]).numpy()
        np.testing.assert_array_equal(got, want)
