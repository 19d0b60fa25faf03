"""Minimal wandb stub so the reference trainer (which imports wandb at
module level) can run without the real package. Only the surface the
reference touches when --wandb is off."""
def login(*a, **k): pass
def init(*a, **k): pass
def log(*a, **k): pass
def log_artifact(*a, **k): pass
class Artifact:
    def __init__(self, *a, **k): pass
    def add_file(self, *a, **k): pass
class Video:
    def __init__(self, *a, **k): pass
