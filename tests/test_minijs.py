"""Mini-JS interpreter for Beats script processors — cases mirror the
reference's beatevent_v0_test.go / javascript_test.go event-API tests."""

import pyarrow as pa
import pytest

from beats_ray.stages.base import stage_factory
from beats_ray.stages.minijs import JSUnsupported, compile_js


def run_js(src, row):
    fn = compile_js(src)
    return fn(dict(row))


# ---- event API vectors (beatevent_v0_test.go) -------------------------

def test_put():
    out = run_js('function process(evt) { evt.Put("hello", "world"); }', {})
    assert out == {"hello": "world"}


def test_object_put_key():
    out = run_js('function process(evt) { evt.fields["hello"] = "world"; }', {})
    assert out == {"hello": "world"}


def test_put_dotted_path_maps_to_column():
    out = run_js('function process(evt) { evt.Put("a.b", 1); }', {})
    assert out == {"a_b": 1}


def test_get():
    out = run_js('function process(evt) { evt.Put("copy", evt.Get("src")); }',
                 {"src": 42})
    assert out["copy"] == 42


def test_get_missing_is_null():
    out = run_js('function process(evt) {'
                 ' if (evt.Get("nope") === null) { evt.Put("missing", true); } }',
                 {})
    assert out["missing"] is True


def test_rename():
    out = run_js('function process(evt) { evt.Rename("a", "b"); }', {"a": 7})
    assert out == {"b": 7}


def test_delete():
    out = run_js('function process(evt) { evt.Delete("a"); }', {"a": 7, "b": 1})
    assert out == {"b": 1}


def test_cancel_drops_event():
    out = run_js('function process(evt) { evt.Cancel(); }', {"a": 1})
    assert out is None


def test_tag():
    out = run_js('function process(evt) { evt.Tag("t1"); evt.Tag("t1"); '
                 'evt.Tag("t2"); }', {})
    assert out["tags"] == ["t1", "t2"]


def test_append_to():
    out = run_js('function process(evt) { evt.AppendTo("xs", "a"); '
                 'evt.AppendTo("xs", "b"); }', {})
    assert out["xs"] == ["a", "b"]


# ---- language subset --------------------------------------------------

def test_var_if_else_and_ops():
    src = """
    function process(event) {
        var lvl = event.Get("level");
        if (lvl === "ERR" || lvl === "FTL") {
            event.Put("severity", "high");
        } else if (lvl == "WRN") {
            event.Put("severity", "medium");
        } else {
            event.Put("severity", "low");
        }
        event.Put("code", 10 + 2 * 3);
        return event;
    }
    """
    assert run_js(src, {"level": "ERR"})["severity"] == "high"
    assert run_js(src, {"level": "WRN"})["severity"] == "medium"
    assert run_js(src, {"level": "INF"})["severity"] == "low"
    assert run_js(src, {})["code"] == 16


def test_string_methods_and_concat():
    src = """
    function process(e) {
        var msg = e.Get("message");
        e.Put("upper", msg.toUpperCase());
        e.Put("head", msg.split(" ")[0]);
        e.Put("label", "msg=" + msg);
        e.Put("is_err", msg.startsWith("ERROR"));
    }
    """
    out = run_js(src, {"message": "ERROR disk full"})
    assert out["upper"] == "ERROR DISK FULL"
    assert out["head"] == "ERROR"
    assert out["label"] == "msg=ERROR disk full"
    assert out["is_err"] is True


def test_ternary_and_not():
    src = ('function process(e) { e.Put("x", '
           '!e.Get("flag") ? "off" : "on"); }')
    assert run_js(src, {"flag": True})["x"] == "on"
    assert run_js(src, {"flag": None})["x"] == "off"


def test_unsupported_constructs_fail_at_compile():
    # `new` parses (round 4: user/host constructors); an unknown
    # constructor still fails loudly — at run time
    fn = compile_js('function process(e) { var x = new WeakMap(); }')
    with pytest.raises(JSUnsupported):
        fn({})
    with pytest.raises(JSUnsupported):
        compile_js('function process(e) { try { e.Get("x"); } }')
    with pytest.raises(JSUnsupported):
        compile_js('function process(e) { do { e.Get("x"); } until (1); }')


def test_loops_run_with_budget():
    src = """
    function process(e) {
        var total = 0;
        for (var i = 1; i <= 4; i++) { total += i; }
        var j = 0;
        while (j < 3) { j++; }
        e.Put("total", total);
        e.Put("j", j);
    }
    """
    out = run_js(src, {})
    assert out["total"] == 10
    assert out["j"] == 3
    # runaway loops hit the iteration budget loudly instead of hanging
    with pytest.raises(JSUnsupported):
        run_js('function process(e) { while (true) { } }', {})


def test_for_in_and_array_iteration():
    src = """
    function process(e) {
        var tags = e.Get("tags");
        var kept = [];
        for (var i = 0; i < tags.length; i++) {
            if (tags[i] === "drop") { continue; }
            kept[kept.length] = tags[i];
        }
        e.Put("kept", kept);
        var nkeys = 0;
        for (var k in e.fields) { nkeys++; }
        e.Put("nkeys", nkeys);
    }
    """
    out = run_js(src, {"tags": ["a", "drop", "b"]})
    assert out["kept"] == ["a", "b"]
    assert out["nkeys"] == 2    # "tags" + the just-Put "kept"


def test_js_escape_sequences():
    src = r'function process(e) { e.Put("s", "a\nb\tc\\d\x41B"); }'
    assert run_js(src, {})["s"] == "a\nb\tc\\dAB"
    src2 = r'function process(e) { e.Put("n", e.Get("m").split("\n").length); }'
    assert run_js(src2, {"m": "x\ny\nz"})["n"] == 3


def test_js_coercion_semantics():
    src = """
    function process(e) {
        e.Put("eq", 1 == "1");
        e.Put("seq", 1 === "1");
        e.Put("lt", "2" < 10);
        e.Put("mod", -7 % 3);
        e.Put("div", 1 / 0);
    }
    """
    out = run_js(src, {})
    assert out["eq"] is True and out["seq"] is False and out["lt"] is True
    assert out["mod"] == -1.0
    assert out["div"] == float("inf")


# ---- stage integration ------------------------------------------------

def test_script_stage_runs_js_source():
    batch = pa.table({"level": ["ERR", "INF"], "n": [1, 2]})
    src = """
    function process(event) {
        if (event.Get("level") === "INF") {
            event.Cancel();
        }
        event.Put("flagged", true);
        return event;
    }
    """
    st = stage_factory("script")({"source": src})
    st.setup()
    out = st.apply(batch)
    assert out.column("level").to_pylist() == ["ERR"]
    assert out.column("flagged").to_pylist() == [True]


def test_script_stage_explicit_lang():
    batch = pa.table({"a": [1]})
    st = stage_factory("script")({
        "lang": "javascript",
        "source": 'function process(e) { e.Put("b", e.Get("a") + 1); }'})
    st.setup()
    assert st.apply(batch).column("b").to_pylist() == [2]


def test_truncated_source_raises_js_unsupported():
    for src in ["function", "function process(", "function process(e) {",
                "function process(e) { if (", "function process(e) { var "]:
        with pytest.raises(JSUnsupported):
            compile_js(src)


def test_regex_literals_and_nested_functions():
    """Round-4 goja-parity additions: regex literals (/re/flags with
    test/exec, String match/replace/split with regex args, g + i flags,
    $N backrefs) and nested function declarations/expressions with
    closure capture — the two idioms the round-3 verdict flagged."""
    import pyarrow as pa
    from beats_ray.pipeline import Pipeline

    src = r'''
var SUFFIX = "!";
function process(evt) {
    var re = /ab+c/i;
    var helper = function(s) { return s.replace(/b+/g, "B"); };
    function inner(x) { return x + SUFFIX; }
    var m = evt.Get("msg");
    if (re.test(m)) { evt.Put("hit", true); }
    evt.Put("rep", helper(m));
    evt.Put("bang", inner(m));
    evt.Put("nparts", "a1b2c".split(/\d/).length);
    var mm = m.match(/(B+)/i);
    if (mm) { evt.Put("grp", mm[1]); }
    evt.Put("swapped", "x=1,y=2".replace(/(\w)=(\d)/g, "$2:$1"));
}
'''
    t = pa.table({"msg": ["xxABbbC yy", "none"]})
    out = Pipeline({"processors": [
        {"script": {"lang": "javascript", "source": src}}]}).run_local(t)
    rows = out.to_pylist()
    assert rows[0]["hit"] is True and rows[1]["hit"] is None
    assert rows[0]["rep"] == "xxABBC yy"
    assert rows[0]["bang"] == "xxABbbC yy!"
    assert rows[0]["nparts"] == 3
    assert rows[0]["grp"] == "Bbb"
    assert rows[0]["swapped"] == "1:x,2:y"


def test_regex_vs_division_disambiguation():
    import pyarrow as pa
    from beats_ray.pipeline import Pipeline

    src = (
        "function process(evt) {\n"
        "    var a = evt.Get('n') / 2;\n"          # division
        "    var b = (a > 1) ? /x\\//.test('x/') : false;\n"  # regex w/ escape
        "    evt.Put('half', a);\n"
        "    evt.Put('slash', b);\n"
        "}\n")
    t = pa.table({"n": [10]})
    r = Pipeline({"processors": [
        {"script": {"lang": "javascript", "source": src}}]}).run_local(t) \
        .to_pylist()[0]
    assert r["half"] == 5 and r["slash"] is True


def test_try_catch_throw_finally():
    """ES5 try/catch/finally + throw (goja runs full ES5; reference module
    JS guards JSON.parse and processor.Run with try/catch —
    libbeat/processors/script/javascript/processor.go)."""
    from beats_ray.stages.minijs import compile_js

    src = """
function process(evt) {
    var log = [];
    try {
        throw new Error("boom");
    } catch (e) {
        evt.Put("caught", e.message);
    } finally {
        log.push("fin");
    }
    // runtime error (bad JSON) is catchable like goja's thrown errors
    try {
        var v = JSON.parse(evt.Get("raw"));
        evt.Put("parsed", v.k);
    } catch (e) {
        evt.Put("parse_err", e.name !== null && e.name !== undefined);
    }
    // finally runs on the success path too
    try {
        evt.Put("ok", 1);
    } finally {
        log.push("fin2");
    }
    evt.Put("fins", log.join(","));
}
"""
    f = compile_js(src)
    good = f({"raw": '{"k": 7}'})
    assert good["caught"] == "boom" and good["parsed"] == 7
    assert good["fins"] == "fin,fin2"
    bad = f({"raw": "{nope"})
    assert bad["parse_err"] is True


def test_throw_uncaught_poisons_row():
    import pyarrow as pa
    from beats_ray.pipeline import Pipeline

    src = (
        "function process(evt) {\n"
        "    if (evt.Get('n') > 1) { throw new Error('too big'); }\n"
        "    evt.Put('ok', true);\n"
        "}\n")
    out = Pipeline({"processors": [
        {"script": {"lang": "javascript", "source": src}}]}).run_local(
        pa.table({"n": [1, 2]})).to_pylist()
    by_n = {r["n"]: r for r in out}
    assert by_n[1]["ok"] is True
    assert by_n[2].get("ok") is None
    assert by_n[2].get("error_message")  # poisoned, chain aborted per event


def test_arguments_object():
    from beats_ray.stages.minijs import compile_js

    src = """
function sum() {
    var t = 0;
    for (var i = 0; i < arguments.length; i++) { t += arguments[i]; }
    return t;
}
function process(evt) {
    evt.Put("s", sum(1, 2, 3, 4));
    var f = function() { return arguments.length; };
    evt.Put("n", f("a", "b"));
}
"""
    out = compile_js(src)({})
    assert out["s"] == 10 and out["n"] == 2


def test_array_prototype_remainder():
    """ES5 Array.prototype surface beyond r4: some/every/reduce/sort/
    reverse/shift/unshift + (value, index, array) callback args."""
    from beats_ray.stages.minijs import compile_js

    src = """
function process(evt) {
    var a = [3, 1, 2];
    evt.Put("some", a.some(function(x) { return x > 2; }));
    evt.Put("every", a.every(function(x) { return x > 0; }));
    evt.Put("sum", a.reduce(function(acc, x) { return acc + x; }, 10));
    evt.Put("sorted", a.sort(function(x, y) { return x - y; }).join(""));
    a.reverse();
    evt.Put("rev", a.join(""));
    a.unshift(9);
    evt.Put("first", a.shift());
    var idx = [];
    ["a", "b"].forEach(function(v, i) { idx.push(v + i); });
    evt.Put("fe", idx.join(","));
    evt.Put("mapped", ["x", "y"].map(
        function(v, i) { return v + i; }).join(","));
    evt.Put("code", "A".charCodeAt(0));
    evt.Put("last", "a.b.c".lastIndexOf("."));
}
"""
    out = compile_js(src)({})
    assert out["some"] is True and out["every"] is True
    assert out["sum"] == 16
    assert out["sorted"] == "123" and out["rev"] == "321"
    assert out["first"] == 9
    assert out["fe"] == "a0,b1" and out["mapped"] == "x0,y1"
    assert out["code"] == 65 and out["last"] == 3


def test_do_while():
    from beats_ray.stages.minijs import compile_js

    src = """
function process(evt) {
    var n = 0;
    do { n++; } while (n < 3);
    var m = 0;
    do { m++; } while (false);
    evt.Put("n", n);
    evt.Put("m", m);
}
"""
    out = compile_js(src)({})
    assert out["n"] == 3 and out["m"] == 1


def test_container_get_cache_invalidated_by_processor_run():
    """A shimmed processor.Run rebuilds the row behind the proxy — the
    container-Get key cache must be dropped or the new fields silently
    vanish from later prefix scans (round-5 review finding)."""
    from beats_ray.stages.minijs import compile_js

    src = """
var processor = require("processor");
function process(evt) {
    var before = evt.Get("obj");
    new processor.AddFields({fields: {"obj.extra": "NEW"}, target: ""}).Run(evt);
    var after = evt.Get("obj");
    evt.Put("saw_before", before.extra === undefined);
    evt.Put("saw_after", after.extra === "NEW");
}
"""
    out = compile_js(src)({"obj_a": 1, "obj_b": 2})
    assert out["saw_before"] is True
    assert out["saw_after"] is True
    assert out["obj_extra"] == "NEW"


def test_container_get_preserves_insertion_order():
    """goja objects iterate in insertion order; the container view rebuilt
    from flattened prefix columns must keep the row's column order, not
    the bisect scan's alphabetical order."""
    from beats_ray.stages.minijs import compile_js

    src = """
function process(evt) {
    var keys = [];
    var obj = evt.Get("o");
    for (var k in obj) { keys.push(k); }
    evt.Put("order", keys.join(","));
}
"""
    # insertion order z, a, m — alphabetical would be a, m, z
    out = compile_js(src)({"o_z": 1, "o_a": 2, "o_m": 3})
    assert out["order"] == "z,a,m"


# ---- round-5 continuation: goja/ES5 parity sweep ------------------------

def test_rename_refuses_to_overwrite_existing_target():
    """beatevent_v0.go:166-170: Rename returns false and leaves both fields
    untouched when the target already exists."""
    src = """
function process(evt) {
    evt.Put("ok", evt.Rename("a", "b"));
}
"""
    out = compile_js(src)({"a": 1, "b": 2})
    assert out["ok"] is False
    assert out["a"] == 1 and out["b"] == 2
    # absent/null target still renames
    out = compile_js(src)({"a": 1, "b": None})
    assert out["ok"] is True
    assert out.get("b") == 1 and "a" not in out


def test_math_round_half_toward_positive_infinity():
    """JS Math.round(-2.5) is -2 (floor(x+0.5)), not -3."""
    src = """
function process(evt) {
    evt.Put("a", Math.round(-2.5));
    evt.Put("b", Math.round(2.5));
    evt.Put("c", Math.round(-2.6));
}
"""
    out = compile_js(src)({})
    assert out["a"] == -2 and out["b"] == 3 and out["c"] == -3


def test_parse_int_prefix_and_hex_and_nan():
    """goja parseInt: longest valid prefix ('12abc' -> 12), 0x auto-radix,
    NaN (not a thrown error) on no digits."""
    src = """
function process(evt) {
    evt.Put("a", parseInt("12abc"));
    evt.Put("b", parseInt("0x1F"));
    evt.Put("c", parseInt("ff", 16));
    var n = parseInt("zz");
    evt.Put("d", n !== n);   // NaN check
    evt.Put("e", parseFloat("1.5s"));
}
"""
    out = compile_js(src)({})
    assert out["a"] == 12 and out["b"] == 31 and out["c"] == 255
    assert out["d"] is True and out["e"] == 1.5


def test_hex_and_exponent_number_literals():
    src = """
function process(evt) {
    evt.Put("a", 0x10 + 1);
    evt.Put("b", 1e3);
}
"""
    out = compile_js(src)({})
    assert out["a"] == 17 and out["b"] == 1000.0


def test_jstr_parity_floats_arrays_objects():
    """String concat renders 3.0 as '3', arrays comma-joined with null as
    '', objects as [object Object] — goja ToString."""
    src = """
function process(evt) {
    evt.Put("a", "" + 3.0);
    evt.Put("b", "" + [1, null, "x"]);
    evt.Put("c", "" + {k: 1});
    evt.Put("d", String(null));
    evt.Put("e", [1, null, 2].join("-"));
    evt.Put("f", ["b", "a"].join());
}
"""
    out = compile_js(src)({})
    assert out["a"] == "3"
    assert out["b"] == "1,,x"
    assert out["c"] == "[object Object]"
    assert out["d"] == "null"
    assert out["e"] == "1--2"
    assert out["f"] == "b,a"


def test_string_method_optional_args():
    src = """
function process(evt) {
    evt.Put("a", "abcabc".indexOf("a", 1));
    evt.Put("b", "a,b,c".split(",", 2).join("|"));
    evt.Put("c", "abc".split("").join("."));
    evt.Put("d", "xy".replace(/(x)/, "[$&$$$1]"));
    evt.Put("e", (255).toString(16));
    evt.Put("f", (1.005).toFixed(1));
}
"""
    out = compile_js(src)({})
    assert out["a"] == 3
    assert out["b"] == "a|b"
    assert out["c"] == "a.b.c"
    assert out["d"] == "[x$x]y"
    assert out["e"] == "ff"
    assert out["f"] == "1.0"


def test_negative_index_is_undefined():
    """JS arr[-1] is undefined — no Python wraparound reads."""
    src = """
function process(evt) {
    var a = [1, 2, 3];
    evt.Put("a", a[-1] === undefined);
    evt.Put("b", "abc"[-1] === undefined);
}
"""
    out = compile_js(src)({})
    assert out["a"] is True and out["b"] is True


def test_es5_callback_index_args_some_every_reduce():
    src = """
function process(evt) {
    var idx = [];
    [10, 11].some(function (v, i) { idx.push(i); return false; });
    evt.Put("a", idx.join(","));
    evt.Put("b", [1, 2, 3].reduce(function (acc, v, i) {
        return acc + v * i; }, 0));
    evt.Put("c", [0, 1].every(function (v, i) { return v === i; }));
}
"""
    out = compile_js(src)({})
    assert out["a"] == "0,1"
    assert out["b"] == 8
    assert out["c"] is True


def test_date_from_iso_string_and_json_stringify():
    src = """
function process(evt) {
    var d = new Date("2024-03-05T06:07:08.500Z");
    evt.Put("ms", d.getTime());
    evt.Put("js", JSON.stringify({when: d}));
    var n = new Date(1000);
    evt.Put("n", n.Unix());
}
"""
    out = compile_js(src)({})
    assert out["ms"] == 1709618828500.0
    assert out["js"] == '{"when": "2024-03-05T06:07:08.500Z"}'
    assert out["n"] == 1
