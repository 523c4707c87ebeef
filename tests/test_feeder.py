"""Process-pool feeder tests: shared-memory handoff, ordering, parity with the
in-process path, fallback on failures (data/feeder.py — the pod-scale host feed)."""

import json

import numpy as np
import pytest

from projectiontrainer_tpu.data import datasets, feeder
from tests.util import make_word_tokenizer, write_jpeg


@pytest.fixture(scope="module")
def contrastive_ds(tmp_path_factory):
    root = tmp_path_factory.mktemp("feed_imgs")
    samples = []
    for i in range(6):
        write_jpeg(root / f"img{i}.jpg", size=40, seed=i)
        samples.append({"image": f"img{i}.jpg", "normal_caption": f"class{i % 2}"})
    samples.append({"image": "missing.jpg", "normal_caption": "class0"})
    manifest = root / "train.json"
    manifest.write_text(json.dumps(samples))
    tok = make_word_tokenizer(["class0", "class1"])
    return datasets.ContrastiveDataset.from_json(
        str(manifest), image_root=str(root), tokenizer=tok, image_size=24,
    )


@pytest.fixture(scope="module")
def pool():
    p = feeder.ProcessPixelPool(image_size=24, num_workers=1, slots_per_worker=4)
    yield p
    p.close()


def test_protocol_detected(contrastive_ds):
    assert feeder.supports_process_feed(contrastive_ds)


def test_process_feed_matches_sync(contrastive_ds, pool):
    """Order-preserving parity with in-process __getitem__ (no augmentation, so the
    worker runs the exact PIL-bicubic preprocess path)."""
    idx = list(range(len(contrastive_ds)))
    got = list(feeder.map_samples_processes(contrastive_ds, idx, pool))
    assert len(got) == len(idx)
    for i, sample in zip(idx, got):
        ref = contrastive_ds[i]
        np.testing.assert_array_equal(sample["pixel_values"], ref["pixel_values"])
        np.testing.assert_array_equal(sample["input_ids"], ref["input_ids"])
        assert sample["class_idx"] == ref["class_idx"]
        assert sample["valid"] == ref["valid"]


def test_missing_image_yields_invalid(contrastive_ds, pool):
    """The manifest's missing.jpg resolves to (None, ...) and comes back as the
    dataset's invalid placeholder, preserving stage-0 filter semantics."""
    last = len(contrastive_ds) - 1
    (sample,) = list(feeder.map_samples_processes(contrastive_ds, [last], pool))
    assert sample["valid"] == np.False_


def test_epoch_batches_with_procs(contrastive_ds, pool):
    """num_procs>0 pipeline path produces the same batch stream shape as threads."""
    from projectiontrainer_tpu.data import pipeline

    batches = list(pipeline.epoch_batches(
        contrastive_ds, batch_size=3, epoch=0, seed=0, shuffle=False,
        num_procs=1, prefetch=1,
    ))
    ref = list(pipeline.epoch_batches(
        contrastive_ds, batch_size=3, epoch=0, seed=0, shuffle=False,
        num_workers=2, prefetch=1,
    ))
    assert len(batches) == len(ref)
    for b, r in zip(batches, ref):
        np.testing.assert_array_equal(np.asarray(b["pixel_values"]),
                                      np.asarray(r["pixel_values"]))


def test_augment_seeds_reproducible(tmp_path):
    """With augment=True the parent draws per-sample seeds from the dataset rng:
    two datasets with the same seed produce identical jobs."""
    root = tmp_path
    write_jpeg(root / "x.jpg", size=40, seed=0)
    manifest = root / "m.json"
    manifest.write_text(json.dumps([{"image": "x.jpg", "normal_caption": "c"}]))
    tok = make_word_tokenizer(["c"])
    mk = lambda: datasets.ContrastiveDataset.from_json(
        str(manifest), image_root=str(root), tokenizer=tok, image_size=24,
        augment=True, seed=7,
    )
    a, b = mk(), mk()
    first = a.pixel_job(0)
    assert first == b.pixel_job(0)
    assert a.pixel_job(0) != first  # stream advances


def test_abandoned_stream_does_not_poison_next(contrastive_ds, pool):
    """A generator dropped mid-epoch leaves in-flight tickets/slots behind; the next
    stream must still yield the CORRECT pixels for every index (stream-generation
    ticket tagging: stale results are reclaimed, never matched to new tickets)."""
    idx = list(range(len(contrastive_ds) - 1))  # valid images only

    # abandon a stream after the first sample: its remaining in-flight results
    # land in the shared result queue with the old generation
    g = feeder.map_samples_processes(contrastive_ds, idx, pool)
    next(g)
    g.close()

    # the very next stream over DIFFERENT indices (reversed) must see its own data
    rev = list(reversed(idx))
    got = list(feeder.map_samples_processes(contrastive_ds, rev, pool))
    assert len(got) == len(rev)
    for i, sample in zip(rev, got):
        ref = contrastive_ds[i]
        np.testing.assert_array_equal(sample["pixel_values"], ref["pixel_values"])
        assert sample["class_idx"] == ref["class_idx"]

    # and the pool's slots were all reclaimed (no leak across the two streams)
    assert len(pool._free) == pool.n_slots


def test_live_stale_generator_stops_instead_of_stealing(contrastive_ds, pool):
    """An abandoned generator that is STILL RUNNING (e.g. on a device_prefetch
    feeder thread) must not steal the next stream's results: poll() is
    stream-addressed, so once a newer stream starts the stale generator gets
    StaleStreamError internally and terminates quietly, while the live stream
    yields the correct pixels for every index."""
    import time

    idx = list(range(len(contrastive_ds) - 1))  # valid images only
    old = feeder.map_samples_processes(contrastive_ds, idx, pool)
    first_old = next(old)  # old stream now has in-flight tickets
    np.testing.assert_array_equal(first_old["pixel_values"],
                                  contrastive_ds[idx[0]]["pixel_values"])

    rev = list(reversed(idx))
    new = feeder.map_samples_processes(contrastive_ds, rev, pool)
    first_new = next(new)  # supersedes the old stream

    # the stale generator may flush a few already-buffered samples of its OWN
    # stream, but must terminate (no hang, no exception) without consuming the
    # live stream's results
    leftovers = list(old)
    assert len(leftovers) < len(idx)
    for offset, sample in enumerate(leftovers, start=1):
        ref = contrastive_ds[idx[offset]]
        np.testing.assert_array_equal(sample["pixel_values"], ref["pixel_values"])

    got = [first_new] + list(new)
    assert len(got) == len(rev)
    for i, sample in zip(rev, got):
        ref = contrastive_ds[i]
        np.testing.assert_array_equal(sample["pixel_values"], ref["pixel_values"])
        assert sample["class_idx"] == ref["class_idx"]

    # drain any straggler old-stream results so the slot pool fully recovers
    s3 = pool.new_stream()
    deadline = time.monotonic() + 30
    while len(pool._free) < pool.n_slots and time.monotonic() < deadline:
        pool.poll(s3, timeout=0.5)
    assert len(pool._free) == pool.n_slots


def test_slot_pressure_does_not_shift_aug_seeds(tmp_path):
    """pixel_job consumes dataset RNG; a failed try_submit (no free slot) must NOT
    re-draw it. With max_inflight=1 the submit loop hits the no-slot path constantly —
    the seed assigned to each index must match a sequential draw from a fresh
    dataset regardless (regression: retries used to shift the whole seed stream)."""
    root = tmp_path
    for i in range(6):
        write_jpeg(root / f"img{i}.jpg", size=40, seed=i)
    manifest = root / "m.json"
    manifest.write_text(json.dumps(
        [{"image": f"img{i}.jpg", "normal_caption": "c"} for i in range(6)]
    ))
    tok = make_word_tokenizer(["c"])
    mk = lambda: datasets.ContrastiveDataset.from_json(
        str(manifest), image_root=str(root), tokenizer=tok, image_size=24,
        augment=True, seed=11,
    )
    expected = mk()
    expected_jobs = [expected.pixel_job(i) for i in range(6)]

    seen = []
    ds = mk()
    orig = ds.pixel_job

    def spy(idx):
        job = orig(idx)
        seen.append((idx, job))
        return job

    ds.pixel_job = spy
    # ONE shared slot but max_inflight=3: the submit loop draws a job, fails
    # try_submit (slot busy), and must retry WITHOUT a fresh draw
    p = feeder.ProcessPixelPool(image_size=24, num_workers=1, slots_per_worker=1)
    try:
        got = list(feeder.map_samples_processes(ds, range(6), p, max_inflight=3))
    finally:
        p.close()
    assert len(got) == 6
    # exactly one rng draw per index, in order, matching the sequential stream
    draws = [s for s in seen]
    assert [s[0] for s in draws] == list(range(6))
    assert [s[1] for s in draws] == expected_jobs
