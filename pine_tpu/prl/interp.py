"""Placeholder PRL interpreter entry points (full implementation follows)."""


def interpret(source, **kw):
    raise NotImplementedError("PRL interpreter under construction")


def interpret_file(path, **kw):
    with open(path) as f:
        return interpret(f.read(), filename=path, **kw)
