"""Request/response correlation — the packetbeat transaction analogue.

Packetbeat's protocol analyzers pair requests with responses inside a flow
(e.g. packetbeat/protos/http/http.go:455,485 ``correlate``): the one true
stream-stream join in the reference.  Transcript analogue: within a
conversation (the "flow"), an ``assistant`` turn that is immediately
followed by a ``tool`` turn forms a transaction (request -> tool response);
latency = response ts - request ts.

Ray mapping (SURVEY.md §2.1 packetbeat row): per-conversation
``groupby(conv).map_groups`` over turn order with a vectorized shift —
no cross-conversation state, so the shuffle key is the flow id, exactly
like packetbeat's per-flow state tables.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def correlate_transactions(ds, conv_col: str = "conv_id", order_col: str = "turn_idx",
                           role_col: str = "role", ts_col: str = "ts",
                           req_role: str = "assistant", resp_role: str = "tool"):
    """-> Dataset of (conv_id, req_turn, resp_turn, latency_s)."""

    def pair(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_col, kind="mergesort")
        nxt_role = g[role_col].shift(-1)
        nxt_turn = g[order_col].shift(-1)
        nxt_ts = g[ts_col].shift(-1)
        m = (g[role_col] == req_role) & (nxt_role == resp_role)
        if not m.any():
            return pd.DataFrame({conv_col: pd.Series([], dtype=g[conv_col].dtype),
                                 "req_turn": pd.Series([], dtype=np.int64),
                                 "resp_turn": pd.Series([], dtype=np.int64),
                                 "latency_s": pd.Series([], dtype=np.float64)})
        lat = (nxt_ts[m] - g[ts_col][m]).dt.total_seconds()
        return pd.DataFrame({
            conv_col: g[conv_col][m].to_numpy(),
            "req_turn": g[order_col][m].astype(np.int64).to_numpy(),
            "resp_turn": nxt_turn[m].astype(np.int64).to_numpy(),
            "latency_s": lat.astype(np.float64).to_numpy(),
        })

    return ds.groupby(conv_col).map_groups(pair, batch_format="pandas")
