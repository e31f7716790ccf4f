from .logging import TermColor, Throughput, epoch_log, fmt_eta
