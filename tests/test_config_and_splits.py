"""Config system (vl_argparse equivalent), splits generator, CLI plumbing."""

import dataclasses

import numpy as np
import pytest

from mcncrossmodalemotions_tpu.utils.config import (
    config_hash,
    override,
    parse_overrides,
    struct2str,
    to_dict,
)


@dataclasses.dataclass(frozen=True)
class Inner:
    batch_size: int = 64
    lr: float = 0.1


@dataclasses.dataclass(frozen=True)
class Outer:
    name: str = "exp"
    enabled: bool = False
    train: Inner = Inner()


def test_override_dotted_path():
    cfg = override(Outer(), "train.batch_size", 32)
    assert cfg.train.batch_size == 32
    assert cfg.train.lr == 0.1  # untouched


def test_parse_overrides_cli_strings():
    cfg = parse_overrides(Outer(), "train.lr=0.01", "enabled=true",
                          "name=hello")
    assert cfg.train.lr == 0.01
    assert cfg.enabled is True
    assert cfg.name == "hello"


def test_parse_overrides_kwargs():
    cfg = parse_overrides(Outer(), train__batch_size=128)
    assert cfg.train.batch_size == 128


def test_override_unknown_key_raises():
    with pytest.raises(AttributeError):
        override(Outer(), "nope", 1)
    with pytest.raises(AttributeError):
        override(Outer(), "name.deeper", 1)


def test_config_hash_stability():
    assert config_hash(Outer()) == config_hash(Outer())
    assert config_hash(Outer()) != config_hash(
        parse_overrides(Outer(), "train.lr=0.5"))


def test_struct2str_renders_nested():
    text = struct2str(Outer())
    assert "batch_size: 64" in text
    assert "train:" in text


def test_to_dict_roundtrip():
    d = to_dict(parse_overrides(Outer(), "train.lr=0.3"))
    assert d["train"]["lr"] == 0.3


# --- splits ---------------------------------------------------------------

def test_identity_splits_no_leakage():
    from mcncrossmodalemotions_tpu.data.splits import generate_identity_splits

    speakers = [f"spk{i % 10}" for i in range(200)]
    sets = generate_identity_splits(speakers, unheard_fraction=0.3,
                                    heard_val_fraction=0.1, seed=0)
    speakers = np.asarray(speakers)
    unheard_spk = set(speakers[sets == 2])
    train_spk = set(speakers[sets == 1])
    heard_spk = set(speakers[sets == 3])
    assert not (unheard_spk & train_spk)
    assert not (unheard_spk & heard_spk)
    assert heard_spk <= train_spk
    assert {1, 2, 3} == set(np.unique(sets))


def test_identity_splits_deterministic():
    from mcncrossmodalemotions_tpu.data.splits import generate_identity_splits

    speakers = [f"s{i % 40}" for i in range(400)]
    a = generate_identity_splits(speakers, seed=3)
    b = generate_identity_splits(speakers, seed=3)
    np.testing.assert_array_equal(a, b)
    c = generate_identity_splits(speakers, seed=4)
    assert not np.array_equal(a, c)  # 40 speakers: collision ~impossible


def test_split_manifest_roundtrip(tmp_path):
    from mcncrossmodalemotions_tpu.data.emovox import build_synthetic_imdb
    from mcncrossmodalemotions_tpu.data.splits import (
        apply_splits,
        export_split_manifest,
        load_split_manifest,
    )

    imdb = build_synthetic_imdb(tmp_path / "wavs", num_speakers=5,
                                tracks_per_speaker=4)
    imdb = apply_splits(imdb, unheard_fraction=0.4, heard_val_fraction=0.25,
                        seed=1)
    original = imdb.set_id.copy()
    export_split_manifest(imdb, tmp_path / "split.json")
    imdb.set_id = np.zeros_like(imdb.set_id)
    load_split_manifest(imdb, tmp_path / "split.json")
    np.testing.assert_array_equal(imdb.set_id, original)


def test_split_validation_catches_leakage(tmp_path):
    from mcncrossmodalemotions_tpu.data.emovox import build_synthetic_imdb
    from mcncrossmodalemotions_tpu.data.splits import validate_splits

    imdb = build_synthetic_imdb(tmp_path / "wavs", num_speakers=2,
                                tracks_per_speaker=2)
    imdb.set_id = np.asarray([1, 2, 2, 1], np.int32)  # spk leaks into both
    with pytest.raises(AssertionError):
        validate_splits(imdb)


# --- CLI ------------------------------------------------------------------

def test_cli_help_and_unknown():
    from mcncrossmodalemotions_tpu.cli import main

    assert main(["--help"]) == 0
    assert main(["nonsense"]) == 1


def test_apply_splits_explicit_mapping_generates_heard_val(tmp_path):
    """With a published speaker->set mapping, the track-level seen-heard
    (set 3) assignment must still be generated for train speakers."""
    from mcncrossmodalemotions_tpu.data.emovox import build_synthetic_imdb
    from mcncrossmodalemotions_tpu.data.splits import apply_splits

    imdb = build_synthetic_imdb(tmp_path / "wavs", num_speakers=4,
                                tracks_per_speaker=10)
    mapping = {"spk000": 1, "spk001": 1, "spk002": 1, "spk003": 2}
    imdb = apply_splits(imdb, speaker_to_set=mapping,
                        heard_val_fraction=0.2, seed=0)
    assert (imdb.set_id == 3).sum() > 0, "seen-heard partition must exist"
    assert (imdb.set_id == 2).sum() == 10
    # determinism
    imdb2 = apply_splits(imdb, speaker_to_set=mapping,
                         heard_val_fraction=0.2, seed=0)
    np.testing.assert_array_equal(imdb.set_id, imdb2.set_id)


def test_cli_ferplus_with_csvs(tmp_path, monkeypatch):
    """CLI ferplus command end-to-end on synthetic csvs (dev mode)."""
    from mcncrossmodalemotions_tpu.cli import main

    pix = " ".join(["120"] * (48 * 48))
    fer = tmp_path / "fer2013.csv"
    plus = tmp_path / "fer2013new.csv"
    rows_fer = ["emotion,pixels,Usage"]
    rows_plus = ["Usage,Image name,neutral,happiness,surprise,sadness,"
                 "anger,disgust,fear,contempt,unknown,NF"]
    for i in range(30):
        usage = ["Training", "PublicTest", "PrivateTest"][i % 3]
        rows_fer.append(f"0,{pix},{usage}")
        votes = ["0"] * 10
        votes[i % 4] = "8"
        rows_plus.append(f"{usage},fer{i:07d}.png," + ",".join(votes))
    fer.write_text("\n".join(rows_fer))
    plus.write_text("\n".join(rows_plus))
    monkeypatch.chdir(tmp_path)
    rc = main([
        "ferplus", f"data.fer_csv={fer}", f"data.ferplus_csv={plus}",
        "tiny_model=true", "input_size=48", "dropout=0.0", "batch_size=8",
        "lr_values=[0.05]", "lr_epochs=[1]", f"out_root={tmp_path}/exps",
    ])
    assert rc == 0
    import pathlib

    assert list(pathlib.Path(tmp_path, "exps").rglob("net-epoch-1.msgpack"))


def test_cli_distill_missing_data_errors(tmp_path, monkeypatch):
    from mcncrossmodalemotions_tpu.cli import main

    monkeypatch.chdir(tmp_path)
    with pytest.raises(FileNotFoundError):
        main(["distill", "num_epochs=1", "tiny_model=true",
              f"data_root={tmp_path}/nonexistent"])


def test_cli_distill_with_saved_imdb(tmp_path, monkeypatch):
    """CLI distill command end-to-end from a saved imdb npz (data_root)."""
    from mcncrossmodalemotions_tpu.cli import main
    from mcncrossmodalemotions_tpu.data.emovox import build_synthetic_imdb

    imdb = build_synthetic_imdb(tmp_path / "wavs", num_speakers=2,
                                tracks_per_speaker=3)
    data_root = tmp_path / "data"
    imdb.save(data_root / "emovoxceleb-imdb.npz")
    monkeypatch.chdir(tmp_path)
    rc = main([
        "distill", "num_epochs=1", "batch_size=2", "tiny_model=true",
        "mini_epoch_ratio=1.0", "mini_val=1.0",
        f"data_root={data_root}", f"out_root={tmp_path}/exps",
    ])
    assert rc == 0
    import pathlib

    assert list(pathlib.Path(tmp_path, "exps").rglob("net-epoch-1.msgpack"))


def test_cli_fetch_lists_and_fails_cleanly(capsys):
    from mcncrossmodalemotions_tpu.cli import main

    assert main(["fetch"]) == 0
    out = capsys.readouterr().out
    assert "senet50-ferplus" in out and "vggface2" in out
    assert main(["fetch", "no-such-artifact"]) == 1


def test_override_optional_fields_coerce_by_annotation():
    """Optional[...] fields with None defaults must coerce CLI strings
    by their ANNOTATION — 'use_bnorm=false' must become False, not the
    truthy string 'false'."""
    from mcncrossmodalemotions_tpu.exp.ferplus_baselines import FerPlusConfig
    from mcncrossmodalemotions_tpu.utils.config import parse_overrides

    cfg = parse_overrides(FerPlusConfig(), "use_bnorm=false")
    assert cfg.use_bnorm is False
    cfg = parse_overrides(FerPlusConfig(), "use_bnorm=true",
                          "data_type=clean", "pretrained_mat=/x.mat")
    assert cfg.use_bnorm is True
    assert cfg.data_type == "clean" and cfg.pretrained_mat == "/x.mat"


def test_cli_analysis_commands_end_to_end(tmp_path, monkeypatch, capsys):
    """The reference's analysis entry points are all CLI-reachable
    (SURVEY L6): fetch-imdb, student-stats, teacher-stats, sample-audio
    driven over a saved synthetic manifest with the random-model null."""
    from mcncrossmodalemotions_tpu.cli import main
    from mcncrossmodalemotions_tpu.data.emovox import build_synthetic_imdb

    imdb = build_synthetic_imdb(tmp_path / "wavs", num_speakers=2,
                                tracks_per_speaker=3)
    npz = tmp_path / "imdb.npz"
    imdb.save(npz)
    monkeypatch.chdir(tmp_path)

    assert main(["fetch-imdb", f"cache={npz}"]) == 0
    assert "wavs; sets" in capsys.readouterr().out

    assert main(["student-stats", f"imdb={npz}", "model=random",
                 f"cache={tmp_path / 'aucs.json'}",
                 f"fig_dir={tmp_path / 'figs'}", "vis_hist=true"]) == 0
    out = capsys.readouterr().out
    assert "meanAuc" in out
    assert (tmp_path / "figs" / "student-pred-hist.jpg").exists()
    assert (tmp_path / "aucs.json").exists()

    assert main(["teacher-stats", f"imdb={npz}",
                 f"fig={tmp_path / 'hist.pdf'}"]) == 0
    assert "emovoxceleb" in capsys.readouterr().out
    assert (tmp_path / "hist.pdf").exists()

    assert main(["sample-audio", f"imdb={npz}",
                 f"out={tmp_path / 'samples'}", "per_emotion=2"]) == 0
    copied = list((tmp_path / "samples").rglob("meta.txt"))
    assert copied, "sample packs with meta.txt expected"


def test_cli_external_benchmark_commands(tmp_path, monkeypatch, capsys):
    """audio-feats / visual-feats / emo-benchmarks commands run the
    external-benchmark pipeline (feature dump -> cross-val -> confusion
    figure) on a synthetic dataset with the random-model null."""
    from mcncrossmodalemotions_tpu.cli import main

    monkeypatch.chdir(tmp_path)
    root = tmp_path / "rml"

    assert main(["audio-feats", "dataset=synthetic", f"root={root}",
                 "model=random", f"feats={tmp_path / 'feats.npz'}"]) == 0
    assert (tmp_path / "feats.npz").exists()

    assert main(["emo-benchmarks", "dataset=synthetic", f"root={root}",
                 "modality=audio", "model=random",
                 f"feats={tmp_path / 'feats.npz'}", "num_folds=3",
                 f"fig_dir={tmp_path / 'figs'}",
                 f"exp_root={tmp_path / 'exps'}"]) == 0
    out = capsys.readouterr().out
    assert "acc" in out
    assert list((tmp_path / "figs").glob("*-confusion.pdf"))
    assert list((tmp_path / "exps").rglob("mnr-params*")), \
        "run_cross_val's per-fold mnr params should persist under exp_root"

    assert main(["visual-feats", "dataset=synthetic", f"root={root}",
                 "model=random", f"feats={tmp_path / 'vfeats.npz'}"]) == 0
    assert (tmp_path / "vfeats.npz").exists()
