from sgb_data_validator_spark.vocab.iso639 import ISO_639_1_CODES

__all__ = ["ISO_639_1_CODES"]
