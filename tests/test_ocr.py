"""Two-stage OCR pipeline tests (reference paddleocr_v6/pipeline.rs:1-365):
DB postprocess, CTC greedy decode, reading order, crop batching, native nets."""

import numpy as np

from crane_tpu.ocr.pipeline import (
    OcrRegion,
    PaddleOcrPipeline,
    ctc_greedy_decode,
    db_regions,
    detect_preprocess,
    prepare_crops,
    sort_reading_order,
)


class TestCtcDecode:
    DICT = ["", "a", "b", "c", " "]

    def _logits(self, ids, score=5.0):
        lg = np.zeros((len(ids), len(self.DICT)), np.float32)
        for t, i in enumerate(ids):
            lg[t, i] = score
        return lg

    def test_collapses_repeats_and_blanks(self):
        # a a _ a b b -> "aab"
        text, conf = ctc_greedy_decode(self._logits([1, 1, 0, 1, 2, 2]), self.DICT)
        assert text == "aab"
        assert conf == 5.0

    def test_all_blank_is_empty_with_zero_confidence(self):
        text, conf = ctc_greedy_decode(self._logits([0, 0, 0]), self.DICT)
        assert text == "" and conf == 0.0

    def test_mean_confidence_over_emitted_steps_only(self):
        lg = np.zeros((3, 5), np.float32)
        lg[0, 1] = 2.0   # 'a' emitted
        lg[1, 0] = 9.0   # blank, not counted
        lg[2, 3] = 4.0   # 'c' emitted
        text, conf = ctc_greedy_decode(lg, self.DICT)
        assert text == "ac"
        np.testing.assert_allclose(conf, 3.0)


class TestDbRegions:
    def test_single_blob_grows_and_maps_to_source(self):
        prob = np.zeros((64, 64), np.float32)
        prob[10:14, 20:30] = 0.9  # 4x10 blob
        # map at full resized resolution; source == 2x resized
        boxes = db_regions(prob, (64, 64), (128, 128))
        assert len(boxes) == 1
        left, top, right, bottom, score = boxes[0]
        # grow: gx = ceil(10*0.25)=3, gy = ceil(4*0.25)=1 -> x:[17,32], y:[9,14]
        assert (left, top) == (17 * 2, 9 * 2)
        assert (right, bottom) == ((32 + 1) * 2, (14 + 1) * 2)
        np.testing.assert_allclose(score, 0.9, rtol=1e-6)

    def test_low_score_and_tiny_components_dropped(self):
        prob = np.zeros((64, 64), np.float32)
        prob[5, 5] = 0.9            # 1 px: below min_pixels
        prob[20:24, 20:28] = 0.4    # mean 0.4 < 0.6: dropped
        assert db_regions(prob, (64, 64), (64, 64)) == []

    def test_separate_components_give_separate_boxes(self):
        prob = np.zeros((64, 64), np.float32)
        prob[4:8, 4:20] = 0.95
        prob[40:44, 10:40] = 0.95
        assert len(db_regions(prob, (64, 64), (64, 64))) == 2


class TestReadingOrder:
    def _r(self, left, top, h=10):
        return OcrRegion(left, top, left + 20, top + h, "x", 1.0)

    def test_same_line_sorts_left_to_right(self):
        a, b = self._r(100, 10), self._r(5, 13)
        assert sort_reading_order([a, b]) == [b, a]

    def test_different_lines_sort_top_to_bottom(self):
        a, b = self._r(5, 50), self._r(100, 10)
        assert sort_reading_order([a, b]) == [b, a]


class TestPreprocess:
    def test_limit_side_and_mod32(self):
        img = np.random.default_rng(0).integers(0, 255, (1000, 500, 3), np.uint8)
        x, (w, h) = detect_preprocess(img, limit_side=960)
        assert x.shape == (1, 3, h, w)
        assert w % 32 == 0 and h % 32 == 0 and max(w, h) <= 960 + 16

    def test_small_image_not_upscaled(self):
        img = np.zeros((100, 200, 3), np.uint8)
        _, (w, h) = detect_preprocess(img)
        assert (w, h) == (192, 96)  # round_to_32 of the unscaled size


class TestPipelineEndToEnd:
    DICT = ["", "h", "e", "l", "o", "w", "r", "d"]

    def test_detect_recognize_order(self):
        # white page with two text regions: wide one on top, narrow below
        image = np.full((192, 256, 3), 255, np.uint8)

        def detector(x):
            H, W = x.shape[2], x.shape[3]
            prob = np.zeros((1, 1, H, W), np.float32)
            prob[0, 0, 20:28, 16:120] = 0.95   # top, wide
            prob[0, 0, 120:128, 30:80] = 0.95  # bottom, narrow
            return prob

        def spell(ids, T, C):
            lg = np.zeros((T, C), np.float32)
            for t, i in enumerate(ids):
                lg[t, i] = 8.0
            return lg

        def recognizer(batch):
            # batch is width-sorted: row 0 = narrow (bottom) crop
            T, C = 12, len(self.DICT)
            word_bottom = [5, 4, 6, 3, 7]        # "world"
            word_top = [1, 2, 3, 0, 3, 4]        # "hello" (blank splits ll)
            out = [spell(word_bottom, T, C), spell(word_top, T, C)]
            return np.stack(out[: len(batch)])

        doc = PaddleOcrPipeline(detector, recognizer, self.DICT).recognize(image)
        assert [r.text for r in doc.regions] == ["hello", "world"]
        assert doc.text == "hello\nworld"
        top_region = doc.regions[0]
        assert top_region.top < doc.regions[1].top

    def test_empty_page(self):
        image = np.zeros((64, 64, 3), np.uint8)
        doc = PaddleOcrPipeline(lambda x: np.zeros((1, 1, 64, 64), np.float32),
                                lambda b: None, self.DICT).recognize(image)
        assert doc.text == "" and doc.regions == []


class TestNativeNets:
    def test_detector_shape_and_range(self):
        import jax.numpy as jnp

        from crane_tpu.ocr.nets import db_detector, init_detector_params

        p = init_detector_params(channels=8)
        x = jnp.zeros((1, 3, 64, 96))
        out = np.asarray(db_detector(p, x))
        assert out.shape == (1, 1, 64, 96)
        assert (out >= 0).all() and (out <= 1).all()

    def test_recognizer_ctc_shape(self):
        import jax.numpy as jnp

        from crane_tpu.ocr.nets import ctc_recognizer, init_recognizer_params

        p = init_recognizer_params(n_classes=9, channels=16, layers=1, heads=2)
        x = jnp.zeros((2, 3, 48, 80))
        out = np.asarray(ctc_recognizer(p, x, heads=2))
        assert out.shape == (2, 10, 9)  # T = W/8

    def test_full_pipeline_with_native_nets_runs(self):
        from crane_tpu.ocr.nets import (
            ctc_recognizer,
            db_detector,
            init_detector_params,
            init_recognizer_params,
        )

        det_p = init_detector_params(channels=8, seed=1)
        rec_p = init_recognizer_params(n_classes=9, channels=16, layers=1, heads=2, seed=2)
        pipe = PaddleOcrPipeline(
            lambda x: db_detector(det_p, x),
            lambda b: ctc_recognizer(rec_p, b, heads=2),
            ["", *"abcdefg", " "],
        )
        img = np.random.default_rng(0).integers(0, 255, (96, 128, 3), np.uint8)
        doc = pipe.recognize(img)  # random weights: just must not crash
        assert isinstance(doc.text, str)
        for r in doc.regions:
            assert 0 <= r.left < r.right <= 128 and 0 <= r.top < r.bottom <= 96
