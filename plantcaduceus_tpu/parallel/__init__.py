"""plantcaduceus_tpu.parallel subpackage."""
