from pathtracker_tpu.models import int_circuit
from pathtracker_tpu.models.registry import model_selector, MODEL_FAMILY
