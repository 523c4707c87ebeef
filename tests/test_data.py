"""Data layer tests: preprocessing parity vs HF SiglipImageProcessor, path resolution,
augmentation semantics, datasets over a synthetic manifest, bucketing, pipeline sharding."""

import json
import os

import numpy as np
import pytest

from projectiontrainer_tpu.data import augmentation as aug
from projectiontrainer_tpu.data import bucketing, datasets, image as I, pipeline
from tests.util import make_word_tokenizer, write_jpeg


# ---------------------------------------------------------------------------- image


def test_preprocess_matches_hf_siglip_processor():
    from transformers import SiglipImageProcessor
    from PIL import Image

    proc = SiglipImageProcessor(size={"height": 24, "width": 24})
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 256, size=(40, 36, 3), dtype=np.uint8)
    img = Image.fromarray(arr)
    # reference flow: PIL resize to target then processor (resize is then a no-op)
    resized = img.resize((24, 24), Image.BICUBIC)
    expected = proc(images=resized, return_tensors="np")["pixel_values"][0]  # CHW
    ours = I.preprocess(img, 24)  # HWC
    np.testing.assert_allclose(ours.transpose(2, 0, 1), expected, rtol=1e-5, atol=1e-5)


def test_resolve_image_path_two_roots_and_mimic(tmp_path):
    root1 = tmp_path / "r1"
    root2 = tmp_path / "r2"
    os.makedirs(root1)
    write_jpeg(root1 / "a.jpg")

    # direct hit in root 1
    assert I.resolve_image_path("a.jpg", str(root1), str(root2)) == str(root1 / "a.jpg")

    # MIMIC directory under root 2: first jpg inside
    study = root2 / "p10" / "p100" / "s1"
    os.makedirs(study)
    write_jpeg(study / "img1.jpg")
    write_jpeg(study / "img2.jpg")
    got = I.resolve_image_path("p10/p100/s1", str(root1), str(root2))
    assert got == str(study / "img1.jpg")

    # plain file under root 2
    write_jpeg(root2 / "b.jpg")
    assert I.resolve_image_path("b.jpg", str(root1), str(root2)) == str(root2 / "b.jpg")

    with pytest.raises(FileNotFoundError):
        I.resolve_image_path("missing.jpg", str(root1), str(root2))


# ---------------------------------------------------------------------------- augmentation


def test_augmentation_transforms_preserve_shape_dtype():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(48, 40, 3), dtype=np.uint8)
    for out in [
        aug.flip_horizontal(img),
        aug.scale(img, 0.9),
        aug.scale(img, 1.1),
        aug.shift(img, 5, -7),
        aug.contrast(img, 1.2),
        aug.elastic(img, 15, 2.5, rng=rng),
    ]:
        assert out.shape == img.shape and out.dtype == np.uint8


def test_augmentation_semantics():
    img = np.zeros((10, 10, 3), np.uint8)
    img[:, :5] = 200
    flipped = aug.flip_horizontal(img)
    assert (flipped[:, 5:] == 200).all() and (flipped[:, :5] == 0).all()

    assert np.array_equal(aug.scale(img, 1.0), img)
    # contrast saturates at 255 like cv2.convertScaleAbs
    bright = aug.contrast(np.full((4, 4, 3), 240, np.uint8), 1.2)
    assert bright.max() == 255


def test_pipeline_deterministic_with_seed():
    img = np.random.default_rng(1).integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    a = aug.apply_pipeline(img, rng=np.random.default_rng(7))
    b = aug.apply_pipeline(img, rng=np.random.default_rng(7))
    c = aug.apply_pipeline(img, rng=np.random.default_rng(8))
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


# ---------------------------------------------------------------------------- datasets


@pytest.fixture
def manifest_dir(tmp_path):
    root = tmp_path / "images"
    os.makedirs(root)
    samples = []
    labels = ["Pneumonia", "Edema", "No Finding"]
    for i in range(9):
        name = f"img{i}.jpg"
        write_jpeg(root / name, seed=i)
        samples.append({
            "image": name,
            "problem": f"what disease is shown in image {i}",
            "normal_caption": labels[i % 3],
        })
    mf = tmp_path / "data.json"
    mf.write_text(json.dumps(samples))
    return str(root), str(mf), samples


def test_stage1_dataset(manifest_dir):
    root, mf, _ = manifest_dir
    tok = make_word_tokenizer(["Pneumonia", "Edema", "No", "Finding"])
    ds = datasets.Stage1PairDataset.from_json(
        mf, image_root=root, tokenizer=tok, image_size=16, max_length=8
    )
    s = ds[0]
    assert s["pixel_values"].shape == (16, 16, 3)
    assert s["caption_ids"].shape == (8,)
    assert s["pixel_values"].min() >= -1.0 and s["pixel_values"].max() <= 1.0


def test_stage2_dataset_and_special_tokens(manifest_dir):
    root, mf, _ = manifest_dir
    tok = make_word_tokenizer(
        ["Pneumonia", "Edema", "No", "Finding", "what", "disease", "is", "shown",
         "in", "image"] + [str(i) for i in range(10)]
    )
    ds = datasets.Stage2VQADataset.from_json(
        mf, image_root=root, tokenizer=tok, image_size=16, max_q_len=16, max_a_len=8
    )
    s = ds[0]
    # question tokenized WITHOUT special tokens; answer WITH bos/eos
    assert s["question_ids"][0] != tok.bos_token_id
    assert s["answer_ids"][0] == tok.bos_token_id
    assert s["answer_ids"][-1] == tok.eos_token_id


def test_stage2_dataset_skips_broken_samples(manifest_dir, tmp_path):
    root, mf, samples = manifest_dir
    broken = [{"image": "missing.jpg", "problem": "q", "normal_caption": "a"}] + samples
    mf2 = tmp_path / "broken.json"
    mf2.write_text(json.dumps(broken))
    tok = make_word_tokenizer(["q", "a"])
    ds = datasets.Stage2VQADataset.from_json(
        mf2, image_root=root, tokenizer=tok, image_size=16
    )
    s = ds[0]  # falls through to the next valid sample
    assert s["pixel_values"].shape == (16, 16, 3)


def test_contrastive_dataset_classes_and_invalid(manifest_dir, tmp_path):
    root, mf, samples = manifest_dir
    withbad = samples + [
        {"image": "gone.jpg", "normal_caption": "Pneumonia"},
        {"image": "x.jpg", "normal_caption": "   "},
    ]
    mf2 = tmp_path / "c.json"
    mf2.write_text(json.dumps(withbad))
    tok = make_word_tokenizer(["Pneumonia", "Edema", "No", "Finding"])
    ds = datasets.ContrastiveDataset.from_json(
        mf2, image_root=root, tokenizer=tok, image_size=16, max_text_len=6
    )
    # whitespace caption filtered out entirely
    assert len(ds) == 10
    assert ds.class_names == ["Edema", "No Finding", "Pneumonia"]
    ok = ds[0]
    assert bool(ok["valid"]) and ok["input_ids"].shape == (6,)
    bad = ds[9]  # missing image -> invalid placeholder
    assert not bool(bad["valid"])


def test_classification_dataset_abnormal_remap(manifest_dir):
    root, mf, samples = manifest_dir
    ds = datasets.ClassificationDataset(
        samples, image_root=root, class_names=["Abnormal", "No Finding"], image_size=16,
        handle_abnormal=True, abnormal_source_classes=["Pneumonia", "Edema"],
    )
    s = ds[0]  # Pneumonia -> Abnormal (index 0)
    assert int(s["target_indices"]) == 0
    s2 = ds[2]  # No Finding -> index 1
    assert int(s2["target_indices"]) == 1


def test_balanced_sample(manifest_dir):
    _, _, samples = manifest_dir
    out = datasets.balanced_sample(
        samples, candidate_labels=["Pneumonia", "Edema"], per_label=2, seed=1
    )
    assert len(out) == 4
    labels = [s["normal_caption"] for s in out]
    assert labels.count("Pneumonia") == 2 and labels.count("Edema") == 2


def test_stratified_split():
    samples = [{"normal_caption": "A"}] * 20 + [{"normal_caption": "B"}] * 10
    train, val = datasets.stratified_split(samples, val_ratio=0.1, seed=0)
    assert len(train) + len(val) == 30
    val_labels = [s["normal_caption"] for s in val]
    assert "A" in val_labels and "B" in val_labels


# ---------------------------------------------------------------------------- bucketing


def test_bucket_for_and_pad():
    assert bucketing.bucket_for(5, (32, 64)) == 32
    assert bucketing.bucket_for(33, (32, 64)) == 64
    assert bucketing.bucket_for(999, (32, 64)) == 64
    left = bucketing.pad_to(np.array([1, 2]), 4, 0, side="left")
    np.testing.assert_array_equal(left, [0, 0, 1, 2])
    right = bucketing.pad_to(np.array([1, 2]), 4, 0, side="right")
    np.testing.assert_array_equal(right, [1, 2, 0, 0])


def test_bucket_batcher_static_shapes():
    rng = np.random.default_rng(0)

    def sample(ql, al):
        return {
            "pixel_values": np.zeros((4, 4, 3), np.float32),
            "question_ids": np.ones(ql, np.int32),
            "answer_ids": np.ones(al, np.int32),
        }

    b = bucketing.BucketBatcher(batch_size=2, pad_id=0, q_buckets=(8, 16), a_buckets=(8, 16))
    stream = [sample(3, 5), sample(10, 5), sample(4, 6), sample(12, 7), sample(5, 12)]
    batches = list(b.batches(stream))
    shapes = sorted({(bt["question_ids"].shape[1], bt["answer_ids"].shape[1]) for bt in batches})
    # (3,5)+(4,6) -> (8,8); (10,5)+(12,7) -> (16,8); (5,12) flushed repeated -> (8,16)
    assert shapes == [(8, 8), (8, 16), (16, 8)]
    for bt in batches:
        assert bt["question_ids"].shape[0] == 2


# ---------------------------------------------------------------------------- pipeline


def test_host_shard_indices_cover_and_disjoint():
    shards = [
        pipeline.host_shard_indices(10, epoch=0, process_index=i, process_count=3)
        for i in range(3)
    ]
    assert all(len(s) == 4 for s in shards)  # padded to 12
    seen = np.concatenate(shards)
    assert set(seen) == set(range(10))
    # same epoch same order; different epoch differs
    again = pipeline.host_shard_indices(10, epoch=0, process_index=0, process_count=3)
    np.testing.assert_array_equal(shards[0], again)
    other = pipeline.host_shard_indices(10, epoch=1, process_index=0, process_count=3)
    assert not np.array_equal(shards[0], other)


class _ToyDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"x": np.full((2,), i, np.int32)}


def test_epoch_batches_end_to_end():
    ds = _ToyDataset(10)
    batches = list(pipeline.epoch_batches(
        ds, batch_size=4, epoch=0, shuffle=False, num_workers=2, prefetch=1
    ))
    assert len(batches) == 3  # 10 -> 4+4+2(filled to 4)
    all_x = np.concatenate([np.asarray(b["x"])[:, 0] for b in batches[:2]])
    assert set(all_x.tolist()) <= set(range(10))
    assert batches[0]["x"].shape == (4, 2)


def test_bucketing_bounds_compilation_count():
    """The point of static buckets: at most |Q|x|A| distinct shapes reach jit
    (SURVEY §7.3.4 — dynamic padding would compile once per unique length pair)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def fake_step(q, a):
        return q.sum() + a.sum()

    rng = np.random.default_rng(0)
    b = bucketing.BucketBatcher(batch_size=2, pad_id=0, q_buckets=(8, 16), a_buckets=(8, 16))

    def sample():
        ql = int(rng.integers(1, 17))
        al = int(rng.integers(1, 17))
        return {
            "pixel_values": np.zeros((2, 2, 3), np.float32),
            "question_ids": np.ones(ql, np.int32),
            "answer_ids": np.ones(al, np.int32),
        }

    for batch in b.batches([sample() for _ in range(60)]):
        fake_step(jnp.asarray(batch["question_ids"]), jnp.asarray(batch["answer_ids"]))
    assert fake_step._cache_size() <= 4  # 2 q-buckets x 2 a-buckets


def test_batchers_emit_sample_weights():
    """Both batchers mark straggler-filler rows with weight 0 so losses/metrics can
    reproduce the reference's smaller-final-batch semantics exactly."""
    rng = np.random.default_rng(3)

    def sample(ql, al):
        return {
            "pixel_values": rng.normal(size=(4, 4, 3)).astype(np.float32),
            "question_ids": rng.integers(1, 50, size=(ql,)),
            "answer_ids": rng.integers(1, 50, size=(al,)),
        }

    b = bucketing.BucketBatcher(batch_size=4, pad_id=0)
    batches = list(b.batches([sample(10, 20) for _ in range(6)]))
    assert len(batches) == 2
    np.testing.assert_array_equal(batches[0]["sample_weight"], [1, 1, 1, 1])
    np.testing.assert_array_equal(batches[1]["sample_weight"], [1, 1, 0, 0])

    fixed = list(bucketing.fixed_batcher(
        ({"x": np.zeros(2)} for _ in range(5)), 3
    ))
    np.testing.assert_array_equal(fixed[0]["sample_weight"], [1, 1, 1])
    np.testing.assert_array_equal(fixed[1]["sample_weight"], [1, 1, 0])


def test_global_bucket_plan_deterministic_and_complete():
    """The plan is identical across 'hosts' (same seed/epoch), covers every sample
    exactly once as a real row, and marks fillers."""
    rng = np.random.default_rng(0)
    n = 23
    q_lens = rng.integers(1, 200, size=n)
    a_lens = rng.integers(1, 900, size=n)
    mk = lambda: bucketing.global_bucket_plan(
        q_lens, a_lens, batch_size=4, epoch=3, seed=7
    )
    p1, p2 = mk(), mk()
    assert len(p1) == len(p2)
    for b1, b2 in zip(p1, p2):
        assert (b1.q_bucket, b1.a_bucket, b1.n_real) == (b2.q_bucket, b2.a_bucket, b2.n_real)
        np.testing.assert_array_equal(b1.indices, b2.indices)

    real = [int(i) for b in p1 for i in b.indices[:b.n_real]]
    assert sorted(real) == list(range(n))
    for b in p1:
        assert len(b.indices) == 4
        assert b.q_bucket >= q_lens[b.indices[:b.n_real]].max()
        assert b.a_bucket >= a_lens[b.indices[:b.n_real]].max()


def test_planned_epoch_batches_shapes_and_weights():
    from projectiontrainer_tpu.data.pipeline import planned_epoch_batches

    rng = np.random.default_rng(1)

    class DS:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            r = np.random.default_rng(i)
            return {
                "pixel_values": np.full((2, 2, 3), float(i), np.float32),
                "question_ids": r.integers(1, 50, size=(int(q_lens[i]),)).astype(np.int32),
                "answer_ids": r.integers(1, 50, size=(int(a_lens[i]),)).astype(np.int32),
            }

    q_lens = rng.integers(1, 60, size=10)
    a_lens = rng.integers(1, 250, size=10)
    plan = bucketing.global_bucket_plan(q_lens, a_lens, batch_size=4, epoch=0, seed=0)
    batches = list(planned_epoch_batches(DS(), plan, pad_id=0, num_workers=2))
    assert len(batches) == len(plan)
    total_real = 0
    for pb, b in zip(plan, batches):
        assert b["question_ids"].shape == (4, pb.q_bucket)
        assert b["answer_ids"].shape == (4, pb.a_bucket)
        total_real += int(b["sample_weight"].sum())
        # row content matches the planned sample (pixel fill = index)
        np.testing.assert_array_equal(
            b["pixel_values"][:, 0, 0, 0], pb.indices.astype(np.float32)
        )
    assert total_real == 10


def test_token_lengths_substitute_broken_samples(manifest_dir, tmp_path):
    """token_lengths applies the same skip-broken substitution as __getitem__, so the
    global bucket plan matches what the fetch actually returns."""
    from tests.util import make_word_tokenizer

    root, manifest, samples = manifest_dir
    samples = list(samples)
    samples.insert(1, {"image": "img0.jpg", "problem": "", "normal_caption": ""})  # broken
    ds = datasets.Stage2VQADataset(
        samples, image_root=root, tokenizer=make_word_tokenizer(), image_size=16,
        max_q_len=16, max_a_len=16,
    )
    q_lens, a_lens = ds.token_lengths()
    # the broken index reports the lengths of the sample __getitem__ substitutes (idx 2)
    assert q_lens[1] == q_lens[2] and a_lens[1] == a_lens[2]
    fetched = ds[1]
    assert len(fetched["question_ids"]) == q_lens[1]
    assert len(fetched["answer_ids"]) == a_lens[1]


def test_load_image_draft_decode(manifest_dir):
    root, _, _ = manifest_dir
    path = os.path.join(root, "img0.jpg")
    full = I.load_image(path)
    draft = I.load_image(path, draft_size=8)
    assert draft.mode == "RGB"
    # draft decodes at a reduced JPEG scale (or full size for tiny images)
    assert draft.size[0] <= full.size[0]
    # default loader unchanged -> preprocessing parity preserved
    np.testing.assert_array_equal(np.asarray(full), np.asarray(I.load_image(path)))


def test_balanced_sample_cli(tmp_path):
    """python -m ...cli.balanced_sample writes a filtered, balanced, shuffled JSON
    (the reference's standalone balanced_random_sample.py entry point)."""
    import json

    from projectiontrainer_tpu.cli import balanced_sample as bs

    data = (
        [{"image": f"a{i}.jpg", "problem": "q", "normal_caption": "Pneumonia"} for i in range(8)]
        + [{"image": f"b{i}.jpg", "problem": "q", "normal_caption": "Edema"} for i in range(3)]
        + [{"image": f"c{i}.jpg", "problem": "q", "normal_caption": "Other"} for i in range(5)]
    )
    src = tmp_path / "src.json"
    src.write_text(json.dumps(data))
    out = tmp_path / "sub" / "out.json"
    bs.main([
        "--input_json", str(src), "--candidate_labels", "Pneumonia, Edema",
        "--output_path", str(out), "--sample_size", "7", "--seed", "3",
    ])
    got = json.loads(out.read_text())
    labels = [s["normal_caption"] for s in got]
    # 7 split over 2 labels -> 4 Pneumonia (remainder to first) + 3 Edema (capped)
    assert labels.count("Pneumonia") == 4 and labels.count("Edema") == 3
    assert "Other" not in labels
    # deterministic under the same seed
    bs.main([
        "--input_json", str(src), "--candidate_labels", "Pneumonia, Edema",
        "--output_path", str(out), "--sample_size", "7", "--seed", "3",
    ])
    assert json.loads(out.read_text()) == got


def test_device_prefetch_propagates_feeder_exception():
    """A failure on the prefetch feeder thread (e.g. the process feeder's 120s
    stall RuntimeError) must re-raise in the consumer — a silent end-of-stream
    would truncate the epoch and train on partial data."""
    from projectiontrainer_tpu.data import pipeline

    def gen():
        yield {"x": np.zeros(2, np.float32)}
        raise RuntimeError("worker pool stalled")

    it = pipeline.device_prefetch(gen(), size=2)
    next(it)
    with pytest.raises(RuntimeError, match="worker pool stalled"):
        next(it)


def test_pad_to_truncates_on_the_padding_side():
    """Over-bucket truncation keeps the end the padding side protects: the head for
    right padding (tokenizer truncation semantics), the TAIL for left padding
    (generation prompts keep the tokens immediately before the answer)."""
    ids = np.arange(1, 9, dtype=np.int32)  # [1..8]
    np.testing.assert_array_equal(
        bucketing.pad_to(ids, 4, 0, side="right"), [1, 2, 3, 4])
    np.testing.assert_array_equal(
        bucketing.pad_to(ids, 4, 0, side="left"), [5, 6, 7, 8])
    # padding (shorter than size) unchanged by the fix
    np.testing.assert_array_equal(
        bucketing.pad_to(ids[:2], 4, 0, side="left"), [0, 0, 1, 2])


def test_buckets_covering_widens_grid_for_long_max_len():
    """max_q_len/max_a_len beyond the default top bucket must widen the grid, not
    silently truncate every longer sequence at the old top bucket."""
    assert bucketing.buckets_covering(256, bucketing.DEFAULT_Q_BUCKETS) == \
        tuple(bucketing.DEFAULT_Q_BUCKETS)
    wide = bucketing.buckets_covering(512, bucketing.DEFAULT_Q_BUCKETS)
    assert wide[-1] == 512 and wide[:-1] == tuple(bucketing.DEFAULT_Q_BUCKETS)
    assert bucketing.bucket_for(300, wide) == 512


def test_lora_dropout_one_rejected():
    from projectiontrainer_tpu.train import lora as lora_mod

    with pytest.raises(ValueError, match="dropout"):
        lora_mod.LoraConfig(dropout=1.0)
