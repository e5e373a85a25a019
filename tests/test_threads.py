"""Host worker budget (-t/--threads wiring, parse_cmd_line.rs:153-156)."""

import os

from floria_tpu import threads


def test_num_threads_budget():
    try:
        threads.set_num_threads(3)
        assert threads.num_threads() == 3
        threads.set_num_threads(0)  # clamps to 1
        assert threads.num_threads() == 1
    finally:
        threads.set_num_threads(None)
    assert threads.num_threads() == (os.cpu_count() or 1)


def test_parallel_launch_serializes_at_one_thread():
    """-t 1 must run launch items sequentially (and still return all
    results in order)."""
    from floria_tpu.phase import local as L

    calls = []

    def fn(x):
        calls.append(x)
        return x * 2

    try:
        threads.set_num_threads(1)
        assert L._parallel_launch(fn, [1, 2, 3]) == [2, 4, 6]
        assert calls == [1, 2, 3]
        threads.set_num_threads(4)
        assert sorted(L._parallel_launch(fn, [4, 5])) == [8, 10]
    finally:
        threads.set_num_threads(None)
