import pytest

from audio_rag_tpu.core.exceptions import ConfigError
from audio_rag_tpu.core.registry import Registry


def test_register_create_get_list():
    reg: Registry = Registry("demo")

    @reg.register("a")
    class A:
        def __init__(self, x=1):
            self.x = x

    @reg.register("b")
    class B:
        pass

    assert reg.list() == ["a", "b"]
    assert reg.get("a") is A
    assert reg.create("a", x=5).x == 5
    assert "a" in reg and "z" not in reg


def test_unknown_backend_raises():
    reg: Registry = Registry("demo")
    with pytest.raises(ConfigError, match="unknown demo backend"):
        reg.get("missing")


def test_duplicate_registration_raises():
    reg: Registry = Registry("demo")

    @reg.register("x")
    class X:
        pass

    with pytest.raises(ConfigError, match="duplicate"):
        @reg.register("x")
        class Y:
            pass


def test_reregister_same_class_ok():
    reg: Registry = Registry("demo")

    class X:
        pass

    reg.register("x")(X)
    reg.register("x")(X)  # idempotent
    assert reg.list() == ["x"]
