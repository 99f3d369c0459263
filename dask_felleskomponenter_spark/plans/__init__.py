from dask_felleskomponenter_spark.plans.queries import QUERIES, flagship
from dask_felleskomponenter_spark.plans.oracles import ORACLES

__all__ = ["QUERIES", "ORACLES", "flagship"]
