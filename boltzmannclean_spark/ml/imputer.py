"""RBMImputer — the reference's ``clean()`` re-architected as a real
``pyspark.ml`` Estimator/Model pair over Spark DataFrames
(SURVEY.md §2.A operator table and §3.2 Entry 3; the north star's
"MLlib pipeline for RBM-based imputation on DataFrames",
BASELINE.json:6-7).

Pipeline (reference operators A1-A13 → Spark):

- encode stats (A3/A4): ONE aggregation job computes per-numerical
  min/max and per-categorical sorted distinct vocabularies; the
  resulting dicts are tiny and broadcast. Sorted vocabs make one-hot
  layout deterministic across runs/partitions.
- fit (A8): v1 trains the numpy CD-1 RBM driver-side on a seeded sample
  (``sample_fraction``) — model quality needs a sample, not the corpus;
  v2 (``distributed_fit=True``) runs per-epoch distributed gradient
  averaging: broadcast params → mapInPandas partial CD-1 gradients →
  driver averages and updates (the classic data-parallel loop; per-epoch
  traffic is one (d×h) matrix per partition, independent of row count).
- transform (A9-A12): one mapInPandas pass with broadcast params —
  encode batch → Gibbs reconstruct → decode (inverse-scale numericals,
  argmax categoricals) → fill ONLY originally-null cells. No shuffle;
  scales linearly and runs identically on 6k or 100 TB of rows.

MLlib integration (round-6): ``RBMImputer`` subclasses
``pyspark.ml.Estimator`` with real ``Param`` plumbing, so it composes in
``Pipeline(stages=[...])`` and persists via the standard
``save(path)`` / ``RBMImputer.load(path)``. ``RBMImputerModel``
subclasses ``pyspark.ml.Model`` and persists its learned state (encode
stats + vocabularies + RBM weight matrices) alongside the params —
``model.save(path)``; ``RBMImputerModel.load(path).transform(df)``
reproduces the original model's output bit-for-bit. The snake_case
constructor keywords and attribute accessors of earlier rounds are kept
as a compatibility surface over the camelCase Params.

Contract (matches upstream ``clean``): output has the input's schema;
observed cells pass through unchanged; numerical fills are un-scaled
reconstructions; categorical fills always come from the observed
vocabulary.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator, Sequence
from dataclasses import dataclass

import numpy as np
import pandas as pd

from pyspark.ml import Estimator, Model
from pyspark.ml.param import Param, Params, TypeConverters
from pyspark.ml.util import (
    DefaultParamsReadable,
    DefaultParamsReader,
    DefaultParamsWritable,
    DefaultParamsWriter,
    MLReadable,
    MLReader,
    MLWritable,
    MLWriter,
)
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from boltzmannclean_spark.ml.rbm import RestrictedBoltzmannMachine


@dataclass
class _EncodeState:
    numerical_columns: list[str]
    categorical_columns: list[str]
    stats: dict[str, tuple[float, float]]  # col -> (min, max)
    vocabs: dict[str, list[str]]  # col -> sorted observed categories

    @property
    def n_visible(self) -> int:
        return len(self.numerical_columns) + sum(
            len(v) for v in self.vocabs.values()
        )


def _encode(pdf: pd.DataFrame, enc: _EncodeState) -> np.ndarray:
    """pandas batch -> [0,1] visible matrix with NaN for missing (A3-A6)."""
    blocks: list[np.ndarray] = []
    for c in enc.numerical_columns:
        lo, hi = enc.stats[c]
        x = pd.to_numeric(pdf[c], errors="coerce").to_numpy(dtype=np.float64)
        span = hi - lo
        scaled = (x - lo) / span if span > 0 else np.where(np.isnan(x), np.nan, 0.5)
        blocks.append(np.clip(scaled, 0.0, 1.0)[:, None])
    for c in enc.categorical_columns:
        vocab = enc.vocabs[c]
        vals = pdf[c]
        onehot = np.zeros((len(pdf), len(vocab)))
        missing = vals.isna().to_numpy()
        onehot[missing, :] = np.nan  # NaN across the whole dummy group (A4)
        index = {v: i for i, v in enumerate(vocab)}
        for row, v in enumerate(vals):
            if not missing[row] and v in index:
                onehot[row, index[v]] = 1.0
        blocks.append(onehot)
    return np.hstack(blocks) if blocks else np.zeros((len(pdf), 0))


def _decode_fill(
    pdf: pd.DataFrame, recon: np.ndarray, enc: _EncodeState
) -> pd.DataFrame:
    """Fill only originally-missing cells from the reconstruction
    (A10-A12); observed values pass through untouched."""
    out = pdf.copy()
    offset = 0
    for c in enc.numerical_columns:
        lo, hi = enc.stats[c]
        col = pd.to_numeric(out[c], errors="coerce")
        missing = col.isna()
        if missing.any():
            filled = recon[:, offset] * (hi - lo) + lo
            col = col.to_numpy(dtype=np.float64)
            col[missing.to_numpy()] = filled[missing.to_numpy()]
            out[c] = col
        offset += 1
    for c in enc.categorical_columns:
        vocab = enc.vocabs[c]
        k = len(vocab)
        missing = out[c].isna().to_numpy()
        if missing.any() and k:
            scores = recon[:, offset : offset + k]
            picks = np.asarray(vocab, dtype=object)[scores.argmax(axis=1)]
            vals = out[c].to_numpy(dtype=object)
            vals[missing] = picks[missing]
            out[c] = vals
        offset += k
    return out


class _RBMImputerParams(Params):
    """Shared Param definitions (MLlib camelCase) + the snake_case
    compatibility accessors earlier rounds exposed as plain attributes."""

    numericalCols = Param(
        Params._dummy(),
        "numericalCols",
        "numerical columns to min-max scale and impute",
        typeConverter=TypeConverters.toListString,
    )
    categoricalCols = Param(
        Params._dummy(),
        "categoricalCols",
        "categorical columns to one-hot encode and impute",
        typeConverter=TypeConverters.toListString,
    )
    nHidden = Param(
        Params._dummy(),
        "nHidden",
        "number of RBM hidden units",
        typeConverter=TypeConverters.toInt,
    )
    learnRate = Param(
        Params._dummy(),
        "learnRate",
        "CD-1 learning rate",
        typeConverter=TypeConverters.toFloat,
    )
    batchSize = Param(
        Params._dummy(),
        "batchSize",
        "CD-1 minibatch size",
        typeConverter=TypeConverters.toInt,
    )
    dropoutFraction = Param(
        Params._dummy(),
        "dropoutFraction",
        "hidden-unit dropout fraction during training",
        typeConverter=TypeConverters.toFloat,
    )
    maxEpochs = Param(
        Params._dummy(),
        "maxEpochs",
        "training epochs",
        typeConverter=TypeConverters.toInt,
    )
    adagrad = Param(
        Params._dummy(),
        "adagrad",
        "use Adagrad-scaled updates",
        typeConverter=TypeConverters.toBoolean,
    )
    seed = Param(
        Params._dummy(),
        "seed",
        "random seed (init, noise-fill, dropout, Gibbs)",
        typeConverter=TypeConverters.toInt,
    )
    sampleFraction = Param(
        Params._dummy(),
        "sampleFraction",
        "fraction of rows sampled for the driver-side fit",
        typeConverter=TypeConverters.toFloat,
    )
    maxFitRows = Param(
        Params._dummy(),
        "maxFitRows",
        "hard cap on driver-side fit rows",
        typeConverter=TypeConverters.toInt,
    )
    distributedFit = Param(
        Params._dummy(),
        "distributedFit",
        "use per-epoch distributed CD-1 gradient averaging",
        typeConverter=TypeConverters.toBoolean,
    )

    _DEFAULTS = dict(
        numericalCols=[],
        categoricalCols=[],
        nHidden=16,
        learnRate=0.1,
        batchSize=32,
        dropoutFraction=0.5,
        maxEpochs=30,
        adagrad=True,
        seed=42,
        sampleFraction=1.0,
        maxFitRows=100_000,
        distributedFit=False,
    )

    def getSeed(self) -> int:
        return self.getOrDefault(self.seed)

    # -- snake_case compatibility surface (rounds 1-5 API) ----------------
    @property
    def numerical_columns(self) -> list[str]:
        return list(self.getOrDefault(self.numericalCols))

    @property
    def categorical_columns(self) -> list[str]:
        return list(self.getOrDefault(self.categoricalCols))

    @property
    def sample_fraction(self) -> float:
        return self.getOrDefault(self.sampleFraction)

    @property
    def max_fit_rows(self) -> int:
        return self.getOrDefault(self.maxFitRows)

    @property
    def distributed_fit(self) -> bool:
        return self.getOrDefault(self.distributedFit)

    @property
    def rbm_kwargs(self) -> dict:
        return dict(
            n_hidden=self.getOrDefault(self.nHidden),
            learn_rate=self.getOrDefault(self.learnRate),
            batch_size=self.getOrDefault(self.batchSize),
            dropout_fraction=self.getOrDefault(self.dropoutFraction),
            max_epochs=self.getOrDefault(self.maxEpochs),
            adagrad=self.getOrDefault(self.adagrad),
            seed=self.getOrDefault(self.seed),
        )

    @rbm_kwargs.setter
    def rbm_kwargs(self, kw: dict) -> None:
        self._set(
            nHidden=kw["n_hidden"],
            learnRate=kw["learn_rate"],
            batchSize=kw["batch_size"],
            dropoutFraction=kw["dropout_fraction"],
            maxEpochs=kw["max_epochs"],
            adagrad=kw["adagrad"],
            seed=kw["seed"],
        )


class RBMImputerModel(Model, _RBMImputerParams, MLWritable, MLReadable):
    """Fitted model: learned encode state + RBM weights. A real
    ``pyspark.ml.Model`` — composes in PipelineModel, persists via
    ``save``/``load`` (params through DefaultParamsWriter metadata,
    learned state as a 1-row JSON parquet under ``<path>/data``)."""

    def __init__(
        self,
        enc: _EncodeState | None = None,
        rbm: RestrictedBoltzmannMachine | None = None,
    ) -> None:
        super().__init__()
        self._setDefault(**_RBMImputerParams._DEFAULTS)
        self.enc = enc
        self.rbm = rbm

    def _transform(self, df: DataFrame) -> DataFrame:
        """Distributed impute: one mapInPandas pass, broadcast weights."""
        enc = self.enc
        spark = df.sparkSession
        bc = spark.sparkContext.broadcast(
            {
                "params": self.rbm.params(),
                "conf": {
                    "n_hidden": self.rbm.n_hidden,
                    "dropout_fraction": self.rbm.dropout_fraction,
                    "seed": self.rbm.seed,
                },
            }
        )

        def impute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            state = bc.value
            rbm = RestrictedBoltzmannMachine(**state["conf"]).set_params(
                state["params"]
            )
            for pdf in batches:
                if not len(pdf):
                    yield pdf
                    continue
                V = _encode(pdf, enc)
                if np.isnan(V).any():
                    recon = rbm.reconstruct(V)
                    yield _decode_fill(pdf, recon, enc)
                else:
                    yield pdf  # nothing missing in this batch

        return df.mapInPandas(impute, schema=df.schema)

    # -- persistence -------------------------------------------------------
    def write(self) -> MLWriter:
        return _RBMImputerModelWriter(self)

    @classmethod
    def read(cls) -> "_RBMImputerModelReader":
        return _RBMImputerModelReader(cls)


class _RBMImputerModelWriter(MLWriter):
    def __init__(self, instance: RBMImputerModel) -> None:
        super().__init__()
        self.instance = instance

    def saveImpl(self, path: str) -> None:
        m = self.instance
        DefaultParamsWriter.saveMetadata(m, path, self.sparkSession)
        state = {
            "numerical_columns": m.enc.numerical_columns,
            "categorical_columns": m.enc.categorical_columns,
            "stats": {c: list(v) for c, v in m.enc.stats.items()},
            "vocabs": m.enc.vocabs,
            "rbm_conf": {
                "n_hidden": m.rbm.n_hidden,
                "learn_rate": m.rbm.learn_rate,
                "batch_size": m.rbm.batch_size,
                "dropout_fraction": m.rbm.dropout_fraction,
                "max_epochs": m.rbm.max_epochs,
                "adagrad": m.rbm.adagrad,
                "seed": m.rbm.seed,
            },
            "W": m.rbm.W.tolist(),
            "b_vis": m.rbm.b_vis.tolist(),
            "b_hid": m.rbm.b_hid.tolist(),
        }
        (
            self.sparkSession.createDataFrame(
                [(json.dumps(state),)], "state string"
            )
            .repartition(1)
            .write.mode("overwrite")
            .parquet(os.path.join(path, "data"))
        )


class _RBMImputerModelReader(MLReader):
    def __init__(self, cls: type) -> None:
        super().__init__()
        self.cls = cls

    def load(self, path: str) -> RBMImputerModel:
        metadata = DefaultParamsReader.loadMetadata(path, self.sparkSession)
        row = self.sparkSession.read.parquet(os.path.join(path, "data")).head()
        state = json.loads(row.state)
        enc = _EncodeState(
            state["numerical_columns"],
            state["categorical_columns"],
            {c: (float(v[0]), float(v[1])) for c, v in state["stats"].items()},
            state["vocabs"],
        )
        rbm = RestrictedBoltzmannMachine(**state["rbm_conf"])
        rbm.W = np.asarray(state["W"], dtype=np.float64)
        rbm.b_vis = np.asarray(state["b_vis"], dtype=np.float64)
        rbm.b_hid = np.asarray(state["b_hid"], dtype=np.float64)
        model = self.cls(enc, rbm)
        model._resetUid(metadata["uid"])
        DefaultParamsReader.getAndSetParams(model, metadata)
        return model


class RBMImputer(
    Estimator, _RBMImputerParams, DefaultParamsWritable, DefaultParamsReadable
):
    """Estimator: learns encode state + RBM weights from a DataFrame.

    A real ``pyspark.ml.Estimator``: drop it into
    ``Pipeline(stages=[RBMImputer(...)])``, persist it with
    ``save(path)`` / ``RBMImputer.load(path)``. Constructor keeps the
    rounds-1-5 snake_case keywords; values live in MLlib ``Param``s."""

    def __init__(
        self,
        numerical_columns: Sequence[str] = (),
        categorical_columns: Sequence[str] = (),
        n_hidden: int = 16,
        learn_rate: float = 0.1,
        batch_size: int = 32,
        dropout_fraction: float = 0.5,
        max_epochs: int = 30,
        adagrad: bool = True,
        seed: int = 42,
        sample_fraction: float = 1.0,
        max_fit_rows: int = 100_000,
        distributed_fit: bool = False,
    ) -> None:
        super().__init__()
        self._setDefault(**_RBMImputerParams._DEFAULTS)
        self._set(
            numericalCols=list(numerical_columns),
            categoricalCols=list(categorical_columns),
            nHidden=n_hidden,
            learnRate=learn_rate,
            batchSize=batch_size,
            dropoutFraction=dropout_fraction,
            maxEpochs=max_epochs,
            adagrad=adagrad,
            seed=seed,
            sampleFraction=sample_fraction,
            maxFitRows=max_fit_rows,
            distributedFit=distributed_fit,
        )

    # -- encode-state job (A3/A4): one aggregation over the data ----------
    def _fit_encode_state(self, df: DataFrame) -> _EncodeState:
        aggs = []
        for c in self.numerical_columns:
            aggs += [F.min(c).alias(f"__min_{c}"), F.max(c).alias(f"__max_{c}")]
        for c in self.categorical_columns:
            aggs.append(F.sort_array(F.collect_set(c)).alias(f"__vocab_{c}"))
        row = df.agg(*aggs).collect()[0].asDict() if aggs else {}
        stats = {
            c: (
                float(row[f"__min_{c}"]) if row[f"__min_{c}"] is not None else 0.0,
                float(row[f"__max_{c}"]) if row[f"__max_{c}"] is not None else 1.0,
            )
            for c in self.numerical_columns
        }
        vocabs = {
            c: [str(v) for v in row[f"__vocab_{c}"]] for c in self.categorical_columns
        }
        return _EncodeState(
            self.numerical_columns, self.categorical_columns, stats, vocabs
        )

    def _fit(self, df: DataFrame) -> RBMImputerModel:
        enc = self._fit_encode_state(df)
        rbm = RestrictedBoltzmannMachine(**self.rbm_kwargs)
        if self.distributed_fit:
            self._fit_distributed(df, enc, rbm)
        else:
            sample = df.select(*enc.numerical_columns, *enc.categorical_columns)
            if self.sample_fraction < 1.0:
                sample = sample.sample(
                    fraction=self.sample_fraction, seed=self.getSeed()
                )
            pdf = sample.limit(self.max_fit_rows).toPandas()
            rbm.fit(_encode(pdf, enc))
        model = RBMImputerModel(enc, rbm)
        model._resetUid(self.uid)
        return self._copyValues(model)

    # -- v2: distributed gradient epochs (A8 at scale) ---------------------
    def _fit_distributed(
        self, df: DataFrame, enc: _EncodeState, rbm: RestrictedBoltzmannMachine
    ) -> None:
        """Per epoch: broadcast params → per-partition CD-1 gradient means
        (mapInPandas) → driver weighted-averages → Adagrad update. Traffic
        per epoch = one (d×h) gradient per partition."""
        spark = df.sparkSession
        rng = np.random.default_rng(self.getSeed())
        rbm.init_params(enc.n_visible, rng)
        data = df.select(*enc.numerical_columns, *enc.categorical_columns)
        for epoch in range(rbm.max_epochs):
            bc = spark.sparkContext.broadcast(
                {"params": rbm.params(), "epoch": epoch}
            )
            kwargs = self.rbm_kwargs

            def grads(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                state = bc.value
                worker = RestrictedBoltzmannMachine(**kwargs).set_params(
                    state["params"]
                )
                dW = np.zeros_like(worker.W)
                dbv = np.zeros_like(worker.b_vis)
                dbh = np.zeros_like(worker.b_hid)
                n = 0
                # mapInPandas batches arrive with a fresh RangeIndex, so
                # the pandas index cannot distinguish partitions — seed
                # from the Spark partition id + a batch counter so every
                # partition/batch draws independent noise-fill and
                # dropout (independence is what makes the averaged
                # gradients unbiased).
                from pyspark import TaskContext

                tc = TaskContext.get()
                part_id = tc.partitionId() if tc is not None else 0
                for batch_no, pdf in enumerate(batches):
                    if not len(pdf):
                        continue
                    V = _encode(pdf, enc)
                    prng = np.random.default_rng(
                        (worker.seed, state["epoch"], part_id, batch_no)
                    )
                    mask = np.isnan(V)
                    V[mask] = prng.random(int(mask.sum()))
                    gW, gv, gh = worker.cd1_gradients(V, prng)
                    w = len(V)
                    dW += gW * w
                    dbv += gv * w
                    dbh += gh * w
                    n += w
                yield pd.DataFrame(
                    {
                        "dW": [dW.ravel().tolist()],
                        "dbv": [dbv.tolist()],
                        "dbh": [dbh.tolist()],
                        "n": [n],
                    }
                )

            parts = data.mapInPandas(
                grads,
                schema="dW array<double>, dbv array<double>, dbh array<double>, n bigint",
            ).collect()
            total = sum(p.n for p in parts) or 1
            dW = sum(np.array(p.dW).reshape(rbm.W.shape) for p in parts) / total
            dbv = sum(np.array(p.dbv) for p in parts) / total
            dbh = sum(np.array(p.dbh) for p in parts) / total
            rbm.apply_gradients(dW, dbv, dbh)
            bc.destroy()

    # -- A13: hyperparameter tuning ---------------------------------------
    def tune(
        self,
        df: DataFrame,
        param_grid: Sequence[dict] | None = None,
        validation_fraction: float = 0.1,
    ) -> "RBMImputer":
        """Hide a fraction of observed cells, score candidate configs by
        masked-cell reconstruction RMSE on a driver-side sample, keep the
        best (reference A13). Returns self reconfigured."""
        enc = self._fit_encode_state(df)
        pdf = (
            df.select(*enc.numerical_columns, *enc.categorical_columns)
            .limit(self.max_fit_rows)
            .toPandas()
        )
        V = _encode(pdf, enc)
        rng = np.random.default_rng(self.getSeed())
        observed = ~np.isnan(V)
        holdout = observed & (rng.random(V.shape) < validation_fraction)
        V_train = V.copy()
        V_train[holdout] = np.nan
        grid = list(
            param_grid
            or [
                {"n_hidden": 8},
                {"n_hidden": 16},
                {"n_hidden": 16, "learn_rate": 0.05},
                {"n_hidden": 32, "dropout_fraction": 0.3},
            ]
        )
        best, best_rmse = None, np.inf
        for cand in grid:
            kwargs = {**self.rbm_kwargs, **cand}
            recon = RestrictedBoltzmannMachine(**kwargs).fit(V_train).reconstruct(
                V_train
            )
            rmse = float(np.sqrt(np.mean((recon[holdout] - V[holdout]) ** 2)))
            if rmse < best_rmse:
                best, best_rmse = kwargs, rmse
        self.rbm_kwargs = best
        self.best_rmse_ = best_rmse
        return self
