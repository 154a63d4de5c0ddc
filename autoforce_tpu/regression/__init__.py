from .sgpr import SgprModel, DataRecord, InducingEnv

__all__ = ["SgprModel", "DataRecord", "InducingEnv"]
