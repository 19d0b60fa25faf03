class Space:
    pass


class Discrete(Space):
    def __init__(self, n):
        self.n = n


class Box(Space):
    def __init__(self, *a, **k):
        pass


class Dict(Space):
    def __init__(self, *a, **k):
        pass
