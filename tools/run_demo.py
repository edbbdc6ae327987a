"""Full-scale convergence demo (docs/DEMO.md recipe) on the real chip.

Synthetic EmoVoxCeleb-style imdb (8 speakers x 25 tracks, emotion-keyed
tone + AM-rate cues, logit_gap=8 teacher targets), FULL-size VGG-M
student, offline cached-logit distillation. Regenerates the DEMO.md
trajectory + heard/unheard ROC table.

Run: timeout 3000 python tools/run_demo.py /tmp/demo_work
"""
import json
import sys
import time
from pathlib import Path

import numpy as np

work = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/demo_work")
work.mkdir(parents=True, exist_ok=True)

from mcncrossmodalemotions_tpu.data.emovox import build_synthetic_imdb
from mcncrossmodalemotions_tpu.exp.compute_audio_feats import (
    compute_audio_feats,
)
from mcncrossmodalemotions_tpu.exp.run_distillation import (
    DistillationConfig,
    run_distillation,
)
from mcncrossmodalemotions_tpu.exp.student_stats import student_stats
from mcncrossmodalemotions_tpu.zoo import build_student

t0 = time.time()
imdb = build_synthetic_imdb(work / "wavs", num_speakers=8,
                            tracks_per_speaker=25, seed=0)
print(f"imdb: {imdb.num_tracks} tracks built ({time.time()-t0:.0f}s)",
      flush=True)

cfg = DistillationConfig(num_epochs=40, batch_size=16,
                         lr_start_exp=-2.0, lr_stop_exp=-3.0,
                         mini_epoch_ratio=1.0, mini_val=1.0,
                         out_root=str(work / "exps"))
state, history, exp_dir = run_distillation(cfg, imdb=imdb)
wall = time.time() - t0
print(f"train wall: {wall:.0f}s", flush=True)

bare = build_student(with_frontend=False)
bare_vars = {"params": state.params["net"],
             "batch_stats": state.model_state["batch_stats"]["net"]}
logits = compute_audio_feats(imdb, model=bare, variables=bare_vars,
                             verbose=False)
stats = student_stats(imdb, student_logits=logits, verbose=False)

out = {
    "wall_s": round(wall, 1),
    "trajectory": [
        {"epoch": h["epoch"],
         "train_loss": round(float(h["train"]["loss"]), 4),
         "train_err": round(float(h["train"]["classerror"]), 3),
         "val_err": round(float(h["val"]["classerror"]), 3)
         if "val" in h else None}
        for h in history if h["epoch"] in (1, 9, 17, 25, 33, 40)
    ],
    "aucs": {part: {k: (round(float(v), 3) if np.isscalar(v) else
                        {e: round(float(a), 2) for e, a in v.items()})
                    for k, v in d.items()}
             for part, d in stats.items()},
}
print(json.dumps(out, indent=1), flush=True)
(work / "demo_result.json").write_text(json.dumps(out, indent=1))
