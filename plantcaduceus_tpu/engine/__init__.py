"""plantcaduceus_tpu.engine subpackage."""
