"""plantcaduceus_tpu.pipelines subpackage."""
