"""CLI for the competition evaluator (mirror of reference evaluate_agent.py).

Usage: PYTHONPATH=. python scripts/evaluate_agent.py <model.safetensors>
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dronerl_tpu.evaluator import DroneRacerEvaluator  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("submission", help="path to a safetensors checkpoint")
    parser.add_argument("--video_output_path", default=None)
    args = parser.parse_args()

    evaluator = DroneRacerEvaluator()
    result = evaluator._evaluate({
        "submission_file_path": args.submission,
        "aicrowd_submission_id": 0,
        "aicrowd_participant_id": 0,
        "video_output_path": args.video_output_path,
    })
    print(f"score: {result['score']:.3f} ± {result['score_secondary']:.3f}")
    print(f"video: {result['media_video_path']}")
    for name, score in sorted(result["all_scores"].items()):
        print(f"  {name:12s} {score:8.2f}")


if __name__ == "__main__":
    main()
