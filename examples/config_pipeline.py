"""The YAML pipeline (examples/pipeline.yaml) exposed in the runner's
module contract: REGISTRY + MAPPING_DIR come entirely from the config
file — this module contains zero wiring of its own.

    python -m a2b_spark.exec.runner --module examples.config_pipeline
"""

import os

from a2b_spark.core.config import registry_from_yaml

_HERE = os.path.dirname(os.path.abspath(__file__))

REGISTRY = registry_from_yaml(os.path.join(_HERE, "pipeline.yaml"))
MAPPING_DIR = "/tmp/a2b_yaml_example/maps"
