"""Restricted Boltzmann Machine (CD-1 contrastive divergence) in numpy.

Behavior-equivalent re-derivation of the reference's RBM
(boltzmannclean's ``RestrictedBoltzmannMachine``, upstream implemented on
TensorFlow 1.x — unavailable here; see SURVEY.md §0/§2.A A7-A9). The
contract matches upstream's documented sklearn-style surface:

- ``fit(X)`` / ``transform(X)`` / ``fit_transform(X)`` on a float matrix
  scaled to [0,1], with ``numpy.nan`` marking missing entries.
- Missing entries are filled with U(0,1) noise during training (A7);
  training is minibatch CD-1 with Bernoulli hidden sampling, hidden-unit
  dropout, and optional Adagrad scaling (A8).
- ``transform`` runs one mean-field Gibbs pass and replaces ONLY the
  originally-missing entries with their reconstruction (A9/A12);
  observed entries pass through bit-identical.

The model is a few KB (W: d×h) — data-parallel by construction: weights
broadcast to executors, the matrix math runs per Arrow batch.
"""

from __future__ import annotations

import numpy as np


def _sigmoid(x: np.ndarray) -> np.ndarray:
    out = np.empty_like(x)
    np.clip(x, -500, 500, out=out)
    return 1.0 / (1.0 + np.exp(-out))


class RestrictedBoltzmannMachine:
    def __init__(
        self,
        n_hidden: int = 16,
        learn_rate: float = 0.1,
        batch_size: int = 32,
        dropout_fraction: float = 0.5,
        max_epochs: int = 30,
        adagrad: bool = True,
        seed: int = 42,
    ) -> None:
        self.n_hidden = n_hidden
        self.learn_rate = learn_rate
        self.batch_size = batch_size
        self.dropout_fraction = dropout_fraction
        self.max_epochs = max_epochs
        self.adagrad = adagrad
        self.seed = seed
        self.W: np.ndarray | None = None
        self.b_vis: np.ndarray | None = None
        self.b_hid: np.ndarray | None = None

    # -- parameter plumbing (broadcastable state) ---------------------------
    def params(self) -> dict[str, np.ndarray]:
        return {"W": self.W, "b_vis": self.b_vis, "b_hid": self.b_hid}

    def set_params(self, p: dict[str, np.ndarray]) -> "RestrictedBoltzmannMachine":
        self.W, self.b_vis, self.b_hid = p["W"], p["b_vis"], p["b_hid"]
        return self

    def init_params(self, n_visible: int, rng: np.random.Generator) -> None:
        self.W = rng.normal(0.0, 0.01, size=(n_visible, self.n_hidden))
        self.b_vis = np.zeros(n_visible)
        self.b_hid = np.zeros(self.n_hidden)

    # -- CD-1 ----------------------------------------------------------------
    def cd1_gradients(
        self, V: np.ndarray, rng: np.random.Generator
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """One CD-1 step on a (noise-filled, fully-observed) minibatch;
        returns mean gradients (dW, db_vis, db_hid). Pure function of
        (params, V, rng) so it runs identically on driver or executor."""
        ph = _sigmoid(V @ self.W + self.b_hid)
        keep = (
            rng.random(ph.shape) >= self.dropout_fraction
            if self.dropout_fraction > 0
            else 1.0
        )
        h = (rng.random(ph.shape) < ph) * keep
        Vr = _sigmoid(h @ self.W.T + self.b_vis)
        phr = _sigmoid(Vr @ self.W + self.b_hid)
        n = len(V)
        dW = (V.T @ ph - Vr.T @ phr) / n
        db_vis = (V - Vr).mean(axis=0)
        db_hid = (ph - phr).mean(axis=0)
        return dW, db_vis, db_hid

    def apply_gradients(
        self, dW: np.ndarray, db_vis: np.ndarray, db_hid: np.ndarray
    ) -> None:
        if self.adagrad:
            if not hasattr(self, "_gW"):
                self._gW = np.zeros_like(self.W)
                self._gv = np.zeros_like(self.b_vis)
                self._gh = np.zeros_like(self.b_hid)
            self._gW += dW**2
            self._gv += db_vis**2
            self._gh += db_hid**2
            eps = 1e-8
            self.W += self.learn_rate * dW / (np.sqrt(self._gW) + eps)
            self.b_vis += self.learn_rate * db_vis / (np.sqrt(self._gv) + eps)
            self.b_hid += self.learn_rate * db_hid / (np.sqrt(self._gh) + eps)
        else:
            self.W += self.learn_rate * dW
            self.b_vis += self.learn_rate * db_vis
            self.b_hid += self.learn_rate * db_hid

    def fit(self, X: np.ndarray) -> "RestrictedBoltzmannMachine":
        X = np.asarray(X, dtype=np.float64)
        rng = np.random.default_rng(self.seed)
        n, d = X.shape
        if self.W is None:
            self.init_params(d, rng)
        mask = np.isnan(X)
        for _ in range(self.max_epochs):
            Xf = X.copy()
            Xf[mask] = rng.random(int(mask.sum()))  # noise-fill (A7)
            order = rng.permutation(n)
            for start in range(0, n, self.batch_size):
                batch = Xf[order[start : start + self.batch_size]]
                if not len(batch):
                    continue
                self.apply_gradients(*self.cd1_gradients(batch, rng))
        return self

    def reconstruct(
        self, X: np.ndarray, seed_offset: int = 1, n_gibbs: int = 10
    ) -> np.ndarray:
        """Clamped mean-field Gibbs: noise-fill missing, then iterate
        up-down passes resetting OBSERVED entries to their true values each
        step, so information flows from observed into missing cells rather
        than the reconstruction collapsing toward sigmoid(bias) ≈ 0.5."""
        X = np.asarray(X, dtype=np.float64)
        rng = np.random.default_rng(self.seed + seed_offset)
        mask = np.isnan(X)
        Xf = X.copy()
        Xf[mask] = rng.random(int(mask.sum()))
        Vr = Xf
        for _ in range(max(1, n_gibbs)):
            ph = _sigmoid(Vr @ self.W + self.b_hid)
            Vr = _sigmoid(ph @ self.W.T + self.b_vis)
            clamped = Vr.copy()
            clamped[~mask] = X[~mask]  # clamp observed
            Vr = clamped
        return Vr

    def transform(self, X: np.ndarray) -> np.ndarray:
        """Replace only missing entries with their reconstruction (A9)."""
        X = np.asarray(X, dtype=np.float64)
        mask = np.isnan(X)
        out = X.copy()
        out[mask] = self.reconstruct(X)[mask]
        return out

    def fit_transform(self, X: np.ndarray) -> np.ndarray:
        return self.fit(X).transform(X)
