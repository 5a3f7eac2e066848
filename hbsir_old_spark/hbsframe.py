"""``view`` accessor sugar (reference parity: P22,
/root/reference/hbsir/hbsframe.py:9-34): ``engine.frame(df).view.original``
returns the table with the named classification attached. Pure convenience
over :meth:`HBSIREngine.add_classification`; the underlying DataFrame is
unchanged and lazy."""

from __future__ import annotations

from pyspark.sql import DataFrame


class _ViewAccessor:
    def __init__(self, frame: "HBSFrame"):
        self._frame = frame

    def __getattr__(self, classification: str) -> DataFrame:
        return self._frame.engine.add_classification(self._frame.df, classification)

    def __getitem__(self, classification: str) -> DataFrame:
        return self.__getattr__(classification)


class HBSFrame:
    """Thin wrapper pairing a DataFrame with its engine for accessor sugar."""

    def __init__(self, df: DataFrame, engine):
        self.df = df
        self.engine = engine

    @property
    def view(self) -> _ViewAccessor:
        return _ViewAccessor(self)

    def __getattr__(self, name):
        return getattr(self.df, name)
