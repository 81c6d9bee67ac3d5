"""Host data-loader behaviors: epoch reshuffle, process sharding, collate."""

import numpy as np

from gluefactory_tpu.datasets.base_dataset import Loader, LoopLoader, collate


class _Squares:
    def __len__(self):
        return 24

    def __getitem__(self, i):
        return {"x": np.full((3,), i, np.float32), "name": f"item{i}"}


def test_loader_epoch_reshuffle():
    loader = Loader(_Squares(), batch_size=4, shuffle=True, num_workers=1, seed=0)
    loader.set_epoch(0)
    e0 = [b["x"][:, 0].tolist() for b in loader]
    loader.set_epoch(1)
    e1 = [b["x"][:, 0].tolist() for b in loader]
    assert e0 != e1  # different order per epoch
    assert sorted(sum(e0, [])) == sorted(sum(e1, []))  # same coverage


def test_loader_process_sharding_disjoint():
    ds = _Squares()
    seen = []
    for pi in range(3):
        loader = Loader(
            ds, batch_size=2, shuffle=False, num_workers=1,
            process_index=pi, process_count=3,
        )
        for b in loader:
            seen += b["x"][:, 0].tolist()
    assert len(seen) == len(set(seen)) == 24  # disjoint and complete


def test_loader_threaded_matches_serial():
    ds = _Squares()
    serial = [b["x"].tolist() for b in Loader(ds, 4, num_workers=1)]
    threaded = [b["x"].tolist() for b in Loader(ds, 4, num_workers=3)]
    assert serial == threaded


def test_loader_worker_error_propagates():
    class Bad(_Squares):
        def __getitem__(self, i):
            if i == 5:
                raise RuntimeError("corrupt item")
            return super().__getitem__(i)

    loader = Loader(Bad(), batch_size=4, num_workers=2)
    try:
        for _ in loader:
            pass
        raised = False
    except RuntimeError:
        raised = True
    assert raised


def test_collate_nested_and_strings():
    s = [
        {"a": np.ones(2), "v": {"b": 1}, "name": "x"},
        {"a": np.zeros(2), "v": {"b": 2}, "name": "y"},
    ]
    out = collate(s)
    assert out["a"].shape == (2, 2)
    assert out["v"]["b"].tolist() == [1, 2]
    assert out["name"] == ["x", "y"]


def test_loop_loader_repeats():
    ll = LoopLoader(Loader(_Squares(), 4, num_workers=1))
    it = iter(ll)
    first = next(it)["x"]
    for _ in range(len(ll)):
        again = next(it)["x"]
    np.testing.assert_array_equal(first, again)
