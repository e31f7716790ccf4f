from .motion_export import export_motions, load_model_from_checkpoint, load_stats, robot_recon_fn
from .reconstruct import reconstruct_long_sequence, reconstruct_single_window, window_starts
from .serialize import ServingModule, export_serving_artifact, load_serving_artifact, make_serving_fns
from .server import ServingApp, make_server
from .client import ServingClient, ServingError
from .streaming import StreamingRetargeter
