import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from magneto_matcher_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="mms_tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "8g"},
    )
    yield s


def sequential_replay_oracle(events):
    """Pure-Python oracle: apply change events one-by-one in LSN order.

    events: list of dicts with lsn/op/conv_id/turn_idx/payload columns.
    Returns {(conv_id, turn_idx): row_dict} of the final state.
    """
    state = {}
    for ev in sorted(events, key=lambda e: e["lsn"]):
        k = (ev["conv_id"], ev["turn_idx"])
        if ev["op"] == "D":
            state.pop(k, None)
        else:
            state[k] = {c: v for c, v in ev.items() if c != "op"}
    return state
