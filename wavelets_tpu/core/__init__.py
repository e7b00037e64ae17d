from .transform import decompose, synthesize, decompose_fn

__all__ = ["decompose", "synthesize", "decompose_fn"]
