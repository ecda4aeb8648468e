

def test_prefetch_early_exit_reaps_producer(tmp_path, rng):
    """Breaking out of the prefetch loop must stop the producer thread and
    release the queued batches (review finding: q.put blocked forever)."""
    import threading
    import time
    from vv_dsp_tpu.io import write_wav
    from vv_dsp_tpu.io.batch import prefetch_batches

    paths = []
    for i in range(3):
        p = tmp_path / f"s{i}.wav"
        write_wav(str(p), rng.standard_normal((1, 256)).astype("float32"), 8000)
        paths.append(str(p))
    chunks = [paths] * 6
    before = threading.active_count()
    for batch in prefetch_batches(chunks, depth=1):
        break  # early exit with the queue full
    deadline = time.time() + 6.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before
