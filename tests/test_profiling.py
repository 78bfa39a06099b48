"""Trace-attribution helpers (utils/profiling.py)."""

from adafocus_tpu.utils.profiling import _group_key


def test_group_key_strips_instance_suffix():
    assert _group_key("fusion.123") == "fusion"
    assert _group_key("my_op.4.clone") == "my_op"
    assert _group_key("copy") == "copy"


def test_group_key_keeps_scope_prefix():
    # same-named ops in different jit scopes must stay distinct rows
    assert _group_key("jit_glance/fusion.7") == "jit_glance/fusion"
    assert _group_key("jit_focus/fusion.3") == "jit_focus/fusion"
    assert _group_key("jit_fn/region/op.12") == "jit_fn/region/op"
