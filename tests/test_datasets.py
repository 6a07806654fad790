

def test_prefetch_iterator():
    import time

    from gen3c_tpu.training.datasets import PrefetchIterator

    produced = []

    def slow_gen():
        for i in range(5):
            produced.append(i)
            yield {"i": i}

    it = PrefetchIterator(slow_gen(), prefetch=2)
    time.sleep(0.1)  # worker fills the queue ahead of consumption
    assert len(produced) >= 2
    items = [b["i"] for b in it]
    assert items == list(range(5))

    # exceptions propagate
    def bad_gen():
        yield {"i": 0}
        raise ValueError("boom")

    it = PrefetchIterator(bad_gen())
    assert next(it)["i"] == 0
    import pytest

    with pytest.raises(ValueError, match="boom"):
        next(it)
