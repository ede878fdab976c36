"""Config engine tests: Hydra-surface composition, interpolation, overrides."""
import pytest

from tests.conftest import CONF_DIR
from lightning_gan_zoo_tpu.config import compose, MissingMandatoryValue
from lightning_gan_zoo_tpu.config.node import Config, resolve_interpolations


def test_dc_gan_composition():
    cfg = compose(CONF_DIR, ["+expt=dc_gan", "dataset=mnist"])
    assert cfg.name == "dc_gan"
    assert cfg.train.img_size == 64
    assert cfg.train.batch_size == 128
    assert cfg.model.noise_dim == 100
    # interpolation through the dataset group
    assert cfg.train.channels_img == 1
    assert cfg.dataset.n_channels == 1
    # optimiser interpolation
    assert cfg.optimiser.lr == 2e-4
    assert cfg.disc_optimiser.lr == 2e-4
    assert cfg.optimiser.betas == [0.5, 0.999]
    # figures appended by the expt defaults list
    assert "sample_grid" in cfg.figures
    assert "interpolation" in cfg.figures


def test_value_overrides_and_types():
    cfg = compose(CONF_DIR, ["+expt=dc_gan", "dataset=mnist",
                             "train.batch_size=32", "calc_fid=False",
                             "optimisation.lr=1e-3"])
    assert cfg.train.batch_size == 32
    assert cfg.calc_fid is False
    assert cfg.optimiser.lr == 1e-3  # interpolation picks up the override


def test_wgan_critic_freq():
    cfg = compose(CONF_DIR, ["+expt=wgan", "dataset=mnist"])
    assert cfg.optimisation.disc_freq == 5
    assert cfg.optimisation.gen_freq == 1
    assert cfg.train.weight_clip == 1e-2
    assert cfg.discriminator.final_sigmoid is False


def test_hologan_group_override():
    cfg = compose(CONF_DIR, ["+expt=hologan", "dataset=celeb_a"])
    # `override /noise_distn: uniform` must replace Normal wholesale
    assert "Uniform" in cfg.noise_distn._target_
    assert "loc" not in cfg.noise_distn
    assert cfg.model.noise_distn.low == -1
    assert cfg.optimisation.gen_freq == 2
    assert "hologan" in cfg.optimisation.lr_scheduler._target_
    assert len(cfg.figures) == 6


def test_pigan_machine_and_list_index_interp():
    cfg = compose(CONF_DIR, ["+expt=pigan", "machine=local",
                             "dataset=celeb_a"])
    assert cfg.model.noise_dim == 128
    assert cfg.nerf.siren_dim_hidden == 256
    # list-index interpolation: init_resolution = resolutions[0]
    assert cfg.discriminator.init_resolution == 16
    assert cfg.variable_batch_size.batch_sizes == [4, 4, 4]
    assert cfg.accumulate_grad_batches.start_epoch == 400
    assert cfg.nerf.latent_z_dim == 128


def test_missing_raises():
    cfg = compose(CONF_DIR, ["+expt=pigan", "dataset=celeb_a"])
    with pytest.raises(MissingMandatoryValue):
        _ = cfg.model.noise_dim  # machine group not selected


def test_anigan_dataset_override_and_deformer():
    cfg = compose(CONF_DIR, ["+expt=anigan", "machine=local"])
    assert "AnimalAnalysisFolder" in cfg.dataset._target_
    assert "TPSDeformer" in cfg.deformer._target_
    assert cfg.nerf.single_shape is True
    assert cfg.loss_weight.silhouette == 1


def test_interpolation_string_concat():
    cfg = Config({"a": {"b": 3}, "msg": "val is ${a.b}!"})
    resolve_interpolations(cfg)
    assert cfg.msg == "val is 3!"


def test_delete_override():
    cfg = compose(CONF_DIR, ["+expt=dc_gan", "dataset=mnist",
                             "~figures.interpolation"])
    assert "interpolation" not in cfg.figures


def test_cli_package_redirect_append_and_replace():
    # Hydra CLI parity: ``+figures@figures.x=choice`` composes
    # conf/figures/choice.yaml into cfg.figures.x (basic_launcher grammar,
    # reference run_network.py figure selection is defaults-list only).
    cfg = compose(CONF_DIR, [
        "+expt=pigan", "machine=local", "dataset=celeb_a",
        "model.noise_dim=64", "train.img_size=32",
        "nerf.siren_dim_hidden=48", "nerf.siren_num_layers=3",
        "nerf.n_pts_per_ray=8", "nerf.n_pts_per_ray_fine=8",
        "resolution_annealing.resolutions=[16,32,32]",
        "variable_batch_size.batch_sizes=[16,16,16]",
        "+figures@figures.azimuth_step=azimuth_step",
    ])
    assert "AzimuthStep" in cfg.figures.azimuth_step._target_
    # the machine=local sample grid default is still there
    assert "sample_grid" in cfg.figures

    # replacing an existing packaged defaults entry swaps the node wholesale
    cfg2 = compose(CONF_DIR, [
        "+expt=hologan", "dataset=celeb_a",
        "figures@figures.azimuth_gif=azimuth_gif_small",
    ])
    assert cfg2.figures.azimuth_gif.ncol == 2
    assert len(cfg2.figures) == 6  # replaced, not appended


def test_cli_package_redirect_unknown_group_raises():
    from lightning_gan_zoo_tpu.config.compose import ComposeError
    with pytest.raises(ComposeError):
        compose(CONF_DIR, ["+expt=dc_gan", "dataset=mnist",
                           "+figuers@figures.x=sample_grid"])


def test_shapes_score_family_configs_compose():
    """tools/shapes_score.py hard-codes the evidence-run override lists;
    pin that both families still compose and target the right task/model
    shapes, so conf/ drift can't silently break checkpoint scoring
    (docs/TRAINING_EVIDENCE.md reproduce commands)."""
    from tools.shapes_score import FAMILIES

    cfg = compose(CONF_DIR, FAMILIES["pigan"]["overrides"])
    assert cfg.model.lm._target_.endswith("tasks.PIGAN")
    assert cfg.train.img_size == FAMILIES["pigan"]["img"] == 32
    assert cfg.nerf.siren_dim_hidden == 48

    cfg = compose(CONF_DIR, FAMILIES["hologan"]["overrides"])
    assert cfg.model.lm._target_.endswith("tasks.HOLOGAN")
    assert cfg.train.img_size == FAMILIES["hologan"]["img"] == 64
    assert cfg.model.noise_dim == 128
    assert cfg.train.batch_size == 32
