"""Import the live reference package (read-only at /root/reference) for
golden-value comparisons.  ``numexpr`` is absent in this environment, so a
minimal eval-based stand-in is installed first (only the single expression
at watroo/wavelets.py:97 is ever evaluated)."""

import inspect
import sys
import types

import numpy as np

REFERENCE_PATH = "/root/reference"


def _install_numexpr_shim():
    if "numexpr" in sys.modules:
        return
    ne = types.ModuleType("numexpr")

    def evaluate(expr, out=None, local_dict=None, global_dict=None, **kw):
        frame = inspect.currentframe().f_back
        env = dict(frame.f_globals)
        env.update(frame.f_locals)
        if local_dict:
            env.update(local_dict)
        namespace = {"exp": np.exp, "sqrt": np.sqrt, "abs": np.abs,
                     "log": np.log}
        result = eval(expr, namespace, env)
        if out is not None:
            out[...] = result
            return out
        return result

    ne.evaluate = evaluate
    sys.modules["numexpr"] = ne


def import_watroo():
    _install_numexpr_shim()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import watroo

    return watroo
