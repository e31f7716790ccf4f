from .generation import compare_to_data, format_report, motion_stats
from .latex import METRICS, generate_latex, get_final_metrics, load_data
from .latent import analyze_checkpoint, get_latent_vectors, load_paired_data_by_action
from .parity import Criterion, evaluate_parity, render_parity_md
from .plots import (
    ALL_METRICS,
    RADAR_METRICS_MAP,
    load_and_aggregate,
    plot_all,
    plot_metric_curve,
    plot_radar_chart,
    smooth,
)
