from .exact import avg_d, dec, sum_d

__all__ = ["avg_d", "dec", "sum_d"]
