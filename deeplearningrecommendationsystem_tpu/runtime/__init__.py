from deeplearningrecommendationsystem_tpu.runtime.logging import (
    print_epoch,
    print_ranking,
    print_report,
)

__all__ = ["print_epoch", "print_ranking", "print_report"]
