"""Host training loop — rebuild of /root/reference/train_multi_gpu.py and
train_single_gpu.py as ONE driver.

The reference forks per-GPU processes with mp.spawn and wraps models in DDP;
here a single process drives one jitted SPMD step over a device mesh (the
``distributed`` config group selects how many devices the batch is sharded
over). Single-device and multi-chip runs are the same code path — the mesh
just has one device.
"""

import logging
import os
import time
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config, parse_probability, parse_segment
from ..data.dataset import CustomAudioDataset, DataLoader
from ..data.multi_channel import MultiChannelAudioDataset
from ..models.model import EncodecModel
from ..models.msstftd import MultiScaleSTFTDiscriminator
from ..parallel.mesh import (batch_sharding, create_mesh, initialize_distributed,
                             replicated_sharding, shard_batch)
from ..utils import count_parameters, save_audio, set_seed
from .balancer import Balancer
from .checkpoint import load_checkpoint, save_checkpoint, wait_pending
from .schedule import warmup_cosine_schedule
from .step import build_eval_step, build_train_step, init_train_state

logger = logging.getLogger('encodec_pytorch_tpu')


def setup_logging(save_folder: str, tag: str):
    """File + console logging with the reference's formatter
    (train_multi_gpu.py:174-189)."""
    logger.handlers.clear()
    logger.setLevel(logging.INFO)
    os.makedirs(save_folder, exist_ok=True)
    formatter = logging.Formatter(
        '%(asctime)s: %(levelname)s: [%(filename)s: %(lineno)d]: %(message)s')
    fh = logging.FileHandler(os.path.join(save_folder, f'train_encodec_{tag}.log'))
    fh.setFormatter(formatter)
    sh = logging.StreamHandler()
    sh.setLevel(logging.INFO)
    sh.setFormatter(formatter)
    logger.addHandler(fh)
    logger.addHandler(sh)
    return logger


def _compute_dtype(config: Config):
    name = 'float32'
    if 'tpu' in config:
        name = str(config.tpu.get('compute_dtype', 'float32'))
    return {'float32': jnp.float32, 'bfloat16': jnp.bfloat16}[name]


def build_model_from_config(config: Config) -> EncodecModel:
    """Model factory mirroring train_multi_gpu.py:199-207."""
    n_q = config.model.get('n_q', None)
    model = EncodecModel._get_model(
        list(config.model.target_bandwidths),
        int(config.model.sample_rate),
        int(config.model.channels),
        causal=bool(config.model.causal),
        model_norm=str(config.model.norm),
        audio_normalize=bool(config.model.audio_normalize),
        segment=parse_segment(config.model.segment),
        name=str(config.model.name),
        ratios=list(config.model.ratios),
        n_q=int(n_q) if n_q else None,
        # `model.filters` configures the discriminator (train_multi_gpu.py:211);
        # the SEANet width has its own optional key
        n_filters=int(config.model.get('n_filters', 32)),
        dtype=_compute_dtype(config))
    return model


def _stft_method(config: Config) -> str:
    name = 'fft'
    if 'tpu' in config:
        name = str(config.tpu.get('stft_method', 'fft'))
    assert name in ('fft', 'matmul'), name
    return name


def build_disc_from_config(config: Config) -> MultiScaleSTFTDiscriminator:
    """Discriminator factory mirroring train_multi_gpu.py:208-215."""
    fpack = 4
    fpack_dx = True
    pallas_v2 = False
    if 'tpu' in config:
        fpack = int(config.tpu.get('disc_fpack', 4))
        fpack_dx = bool(config.tpu.get('disc_fpack_dx', True))
        pallas_v2 = bool(config.tpu.get('disc_pallas_v2', False))
    return MultiScaleSTFTDiscriminator(
        in_channels=int(config.model.channels),
        out_channels=int(config.model.channels),
        filters=int(config.model.filters),
        hop_lengths=tuple(config.model.disc_hop_lengths),
        win_lengths=tuple(config.model.disc_win_lengths),
        n_ffts=tuple(config.model.disc_n_ffts),
        stft_method=_stft_method(config),
        dtype=_compute_dtype(config),
        fpack=fpack, fpack_dx=fpack_dx, pallas_v2=pallas_v2)


def build_dataset(config: Config, mode: str):
    kind = str(config.datasets.get('dataset', 'csv'))
    # (seed, epoch, index)-keyed sample randomness: crop/window positions are
    # reproducible across process restarts, which is what makes mid-epoch
    # preemption resume trajectory-exact (tests/test_preemption_resume.py)
    seed = config.common.seed
    if kind == 'multi_channel':
        return MultiChannelAudioDataset(config, mode=mode, seed=seed)
    return CustomAudioDataset(config, mode=mode, seed=seed)


class Trainer:
    """End-to-end training driver (epoch loop, test loop, ckpt/resume,
    TB logging). Mirrors reference train() (train_multi_gpu.py:172-353)."""

    def __init__(self, config: Config):
        self.config = config
        initialize_distributed()
        # multi-host: only process 0 writes shared artifacts (checkpoints,
        # TB runs, wav demos, wandb) — the reference's `dist.get_rank()==0`
        # gates (train_multi_gpu.py:326,348,156); non-main processes get
        # their own log file so a shared save_folder isn't interleaved
        self.is_main = jax.process_index() == 0
        tag = f"bs{config.datasets.batch_size}_lr{config.optimization.lr}"
        if not self.is_main:
            tag = f"{tag}_p{jax.process_index()}"
        setup_logging(config.checkpoint.save_folder, tag)

        if config.common.seed is not None:
            set_seed(int(config.common.seed))
        if bool(config.distributed.data_parallel):
            n_dev = int(config.distributed.world_size) or 0
        else:
            n_dev = 1
        self.mesh = create_mesh(n_dev)
        self.n_devices = int(self.mesh.devices.size)
        logger.info("device mesh: %d × %s", self.n_devices,
                    jax.devices()[0].platform)

        self.model = build_model_from_config(config)
        self.disc = build_disc_from_config(config)
        self.balancer = Balancer(config.balancer.weights.to_dict())
        logger.info('Loss balancer with weights %s instantiated',
                    self.balancer.weights)

        self.trainset = build_dataset(config, 'train')
        self.testset = build_dataset(config, 'test')
        bs = int(config.datasets.batch_size)
        assert bs % self.n_devices == 0 or self.n_devices == 1, \
            f"batch_size {bs} must divide over {self.n_devices} devices"
        self.tensor_cut = int(config.datasets.tensor_cut)
        # multi-host: each process loads a disjoint slice of the dataset and
        # its share of the global batch; `shard_batch` assembles the global
        # array from per-process shards (the reference's DistributedSampler
        # analogue, train_multi_gpu.py:271-272)
        n_proc = jax.process_count()
        assert bs % n_proc == 0, \
            f"batch_size {bs} must divide over {n_proc} processes"
        local_bs = bs // n_proc
        # device_put happens inside the loader's prefetch thread so the
        # host→HBM copy of batch N+1 overlaps step N (ROADMAP item 4)
        self.trainloader = DataLoader(self.trainset, local_bs, shuffle=True,
                                      fixed_length=self.tensor_cut,
                                      seed=int(config.common.seed or 0),
                                      shard_id=jax.process_index(),
                                      num_shards=n_proc,
                                      transform=self._put_batch)
        self.testloader = DataLoader(self.testset, local_bs, shuffle=False,
                                     fixed_length=self.tensor_cut,
                                     seed=int(config.common.seed or 0),
                                     shard_id=jax.process_index(),
                                     num_shards=n_proc)
        logger.info("There are %d batches to train the EnCodec",
                    len(self.trainloader))
        logger.info("There are %d batches to test the EnCodec",
                    len(self.testloader))

        steps_per_epoch = max(1, len(self.trainloader))
        max_iter = int(config.common.max_epoch) * steps_per_epoch
        warmup_iter = int(config.lr_scheduler.warmup_epoch) * steps_per_epoch
        gen_sched = warmup_cosine_schedule(
            float(config.optimization.lr), max_iter=max_iter, eta_ratio=0.1,
            warmup_iter=warmup_iter, warmup_ratio=1e-4)
        disc_sched = warmup_cosine_schedule(
            float(config.optimization.disc_lr), max_iter=max_iter,
            eta_ratio=0.1, warmup_iter=warmup_iter, warmup_ratio=1e-4)
        self.warmup_epoch = int(config.lr_scheduler.warmup_epoch)
        self.disc_prob = parse_probability(config.model.train_discriminator)

        remat = False
        vjp_chunk = 1
        shared_vjp = True
        # auto: lax.cond only pays off when most steps SKIP the disc update
        # (the cond boundary costs ~13 ms/step in relayout copies of the
        # captured disc residuals — PERF_NOTES "masked disc update"); with
        # the shipped train_discriminator: True the branch always runs, so
        # masked-apply is strictly faster.
        disc_cond = None
        if 'tpu' in config:
            remat = bool(config.tpu.get('remat', False))
            vjp_chunk = int(config.tpu.get('balancer_vjp_chunk', 1))
            shared_vjp = bool(config.tpu.get('shared_disc_vjp', True))
            disc_cond = config.tpu.get('disc_cond_update', None)
        if disc_cond is None:
            disc_cond = self.disc_prob < 0.5
        skip_nonfinite = False
        grad_accum = 1
        if 'tpu' in config:
            skip_nonfinite = bool(config.tpu.get('skip_nonfinite_steps',
                                                 False))
            grad_accum = int(config.tpu.get('grad_accum_steps', 1))
        if grad_accum > 1:
            # the accumulation step always computes+masks the disc update
            # (no cond boundary) and requires the shared-VJP strategy
            if disc_cond:
                logger.info('grad_accum_steps=%d: disc update uses masked '
                            'apply (disc_cond_update ignored)', grad_accum)
            disc_cond = False
            assert bs % grad_accum == 0 and (
                (bs // grad_accum) % self.n_devices == 0
                or self.n_devices == 1), (
                f'batch_size {bs} must divide tpu.grad_accum_steps='
                f'{grad_accum} with each microbatch dividing over '
                f'{self.n_devices} devices')
        self.disc_cond_update = bool(disc_cond)
        self.grad_accum_steps = grad_accum
        step_fn = build_train_step(self.model, self.disc, self.balancer,
                                   gen_sched, disc_sched,
                                   disc_prob=self.disc_prob,
                                   sample_rate=int(config.model.sample_rate),
                                   remat=remat,
                                   balancer_vjp_chunk=vjp_chunk,
                                   stft_method=_stft_method(config),
                                   shared_disc_vjp=shared_vjp,
                                   disc_cond_update=bool(disc_cond),
                                   skip_nonfinite=skip_nonfinite,
                                   grad_accum_steps=grad_accum)
        repl = replicated_sharding(self.mesh)
        donate_state = True
        if 'tpu' in config:
            donate_state = bool(config.tpu.get('donate_state', True))
        donate = (0,) if donate_state else ()
        self.train_step = jax.jit(
            step_fn,
            in_shardings=(repl, batch_sharding(self.mesh), repl, repl),
            out_shardings=(repl, repl),
            donate_argnums=donate)
        self.eval_step = jax.jit(build_eval_step(
            self.model, self.disc, self.balancer,
            int(config.model.sample_rate),
            stft_method=_stft_method(config)))

        # ---- state init / resume
        self.state = init_train_state(self.model, self.disc, self.balancer,
                                      jax.random.PRNGKey(int(config.common.seed or 0)),
                                      example_length=self.tensor_cut)
        self.resume_epoch = 0
        # mid-epoch (preemption) checkpoints: epoch label = completed epochs,
        # state.step = optimizer steps actually taken. When they disagree the
        # first resumed epoch skips the batches the interrupted run already
        # consumed — with (seed, epoch, idx)-keyed crops and fold_in(rng,
        # state.step) step randomness this makes resume trajectory-exact
        # (tests/test_preemption_resume.py)
        self._resume_skip = (0, 0)   # (epoch to skip in, batches to skip)
        if bool(config.checkpoint.resume):
            ckpt_path = str(config.checkpoint.checkpoint_path)
            assert ckpt_path, "resume path is empty"
            self.state, self.resume_epoch = load_checkpoint(ckpt_path, self.state)
            if self.resume_epoch >= int(config.common.max_epoch):
                raise ValueError(
                    f"resume epoch {self.resume_epoch} is larger than total "
                    f"epochs {config.common.max_epoch}")
            done_in_epoch = (int(np.asarray(self.state.step))
                             - self.resume_epoch * steps_per_epoch)
            if done_in_epoch > 0:
                self._resume_skip = (self.resume_epoch + 1,
                                     min(done_in_epoch, steps_per_epoch))
                logger.info(
                    "mid-epoch checkpoint: epoch %d already consumed %d/%d "
                    "batches — they will be skipped on resume",
                    self.resume_epoch + 1, self._resume_skip[1],
                    steps_per_epoch)
            logger.info("loaded checkpoint, resume from epoch %d",
                        self.resume_epoch)
        self.state = jax.device_put(self.state, repl)
        self._repl = repl

        logger.info("Encodec Model Parameters: %d | Disc Model Parameters: %d",
                    count_parameters(self.state.params_g),
                    count_parameters(self.state.params_d))

        self.writer = None
        if self.is_main:
            try:
                from tensorboardX import SummaryWriter
                self.writer = SummaryWriter(
                    log_dir=os.path.join(str(config.checkpoint.save_folder),
                                         'runs'))
                logger.info('Saving tensorboard logs to %s',
                            Path(self.writer.logdir).resolve())
            except Exception as exc:
                logger.warning('tensorboard unavailable: %s', exc)

        # optional wandb (the single-GPU reference trainer's logging surface,
        # train_single_gpu.py:227-240; package gated — not in the TPU image)
        self.wandb = None
        if (self.is_main and 'wandb' in config
                and bool(config.wandb.get('enabled', False))):
            try:
                import wandb
                wandb.init(project=str(config.wandb.get('project', 'encodec-tpu')),
                           name=str(config.wandb.get('name', tag)),
                           config=config.to_dict())
                self.wandb = wandb
            except Exception as exc:
                logger.warning('wandb unavailable: %s', exc)

        # optional profiler traces (SURVEY.md §5: the reference has none;
        # first-class here)
        self.profile_dir = ''
        if 'tpu' in config:
            self.profile_dir = str(config.tpu.get('profile_dir', '') or '')
        self._profiling = False

        self.rng = jax.device_put(
            jax.random.PRNGKey(int(config.common.seed or 0) + 1), repl)

    # ------------------------------------------------------------ train loop

    def _put_batch(self, batch_np):
        """Loader-thread hook: assemble/copy the (per-process) batch onto the
        mesh. jax.device_put is async, so by the time the train loop receives
        the batch the transfer is already in flight or done."""
        return shard_batch(self.mesh, batch_np)

    def train_one_epoch(self, epoch: int):
        """Mirrors train_one_step's per-epoch batch loop
        (train_multi_gpu.py:32-142)."""
        cfg = self.config
        self.trainloader.set_epoch(epoch)
        data_length = len(self.trainloader)
        acc = {}
        acc_count = 0
        disc_allowed = jax.device_put(jnp.asarray(
            self.disc_prob > 0 and epoch >= self.warmup_epoch), self._repl)
        log_interval = int(cfg.common.log_interval)
        skip = self._resume_skip[1] if epoch == self._resume_skip[0] else 0
        if skip:
            logger.info("epoch %d: skipping %d already-consumed batches "
                        "(mid-epoch resume)", epoch, skip)
        t0 = time.time()
        for idx, batch in enumerate(self.trainloader):
            if idx < skip:
                continue
            if self.profile_dir and epoch == 1 and idx == 2:
                jax.profiler.start_trace(self.profile_dir)
                self._profiling = True
            # batch is already on device: the loader's prefetch thread ran
            # _put_batch (shard_batch) while the previous step computed
            self.state, metrics = self.train_step(self.state, batch, self.rng,
                                                  disc_allowed)
            if self._profiling and idx == 6:
                jax.profiler.stop_trace()
                self._profiling = False
                logger.info('wrote profiler trace to %s', self.profile_dir)
            acc_count += 1
            # accumulate on device — a per-step float(v) would force a
            # blocking host round-trip every step and stall the dispatch
            # pipeline; only the log-interval fetch below synchronizes
            acc = (metrics if not acc else
                   jax.tree.map(jnp.add, acc, metrics))
            if idx % log_interval == 0 or idx == data_length - 1:
                denom = acc_count
                # fetch on every process (replicated arrays — purely local
                # reads) so all hosts pace their dispatch queues identically;
                # only process 0 emits (reference train_multi_gpu.py:131)
                host_acc = jax.device_get(acc)
                if not self.is_main:
                    continue
                avg = {k: float(v) / denom for k, v in host_acc.items()}
                dt = (time.time() - t0) / denom
                logger.info(
                    "Epoch %d %d/%d\tAvg loss_G: %.4f\tAvg loss_W: %.4f\t"
                    "lr_G: %.6e\tlr_D: %.6e\tloss_disc: %.4f\t%.3fs/step",
                    epoch, idx + 1, data_length, avg.get('loss_g', 0),
                    avg.get('loss_w', 0), float(metrics['lr_g']),
                    float(metrics['lr_d']), avg.get('loss_disc', 0), dt)
                if avg.get('skipped_nonfinite', 0) > 0:
                    logger.warning(
                        'dropped %d non-finite step(s) in the last %d steps '
                        '(tpu.skip_nonfinite_steps guard)',
                        int(round(avg['skipped_nonfinite'] * denom)), denom)
                if self.writer:
                    gstep = (epoch - 1) * data_length + idx
                    if 'skipped_nonfinite' in avg:
                        self.writer.add_scalar('Train/skipped_nonfinite',
                                               avg['skipped_nonfinite'], gstep)
                    self.writer.add_scalar('Train/Loss_G', avg.get('loss_g', 0), gstep)
                    for k in ('l_t', 'l_f', 'l_g', 'l_feat',
                              'codebook_entropy', 'codebook_dead_frac'):
                        if k in avg:
                            self.writer.add_scalar(f'Train/{k}', avg[k], gstep)
                    self.writer.add_scalar('Train/Loss_W', avg.get('loss_w', 0), gstep)
                    self.writer.add_scalar('Train/Loss_Disc',
                                           avg.get('loss_disc', 0), gstep)
                if self.wandb:
                    gstep = (epoch - 1) * data_length + idx
                    self.wandb.log({f'train/{k}': v for k, v in avg.items()},
                                   step=gstep)

    def test(self, epoch: int):
        """Mirrors test() (train_multi_gpu.py:144-170): eval losses + a
        GT/Reconstruction wav dump."""
        cfg = self.config
        losses = {}
        n = 0
        for batch_np in self.testloader:
            batch = jnp.asarray(batch_np)
            out = self.eval_step(self.state, batch)
            for k, v in out.items():
                losses[k] = losses.get(k, 0.0) + float(v)
            n += 1
        if n == 0:
            return
        # every process evaluates its own test-set shard; only process 0
        # reports (its shard's average — the reference's rank-0 gate keeps
        # even less, the last batch only, train_multi_gpu.py:156-160)
        if not self.is_main:
            return
        avg = {k: v / n for k, v in losses.items()}
        logger.info('| TEST | epoch: %d | loss_g: %.4f | loss_disc: %.4f',
                    epoch, sum(v for k, v in avg.items() if k != 'loss_disc'),
                    avg.get('loss_disc', 0.0))
        if self.writer:
            for k, v in avg.items():
                self.writer.add_scalar(f'Test/{k}', v, epoch)
        if self.wandb:
            self.wandb.log({f'test/{k}': v for k, v in avg.items()})

        # reconstruction demo (uncropped sample)
        try:
            wav, sr = self.testset.get()
            variables = {'params': jax.device_get(self.state.params_g),
                         'quantizer': jax.device_get(self.state.quantizer)}
            out = self.model(variables, jnp.asarray(wav[None]))
            sp = Path(str(cfg.checkpoint.save_folder))
            save_audio(np.asarray(wav), sp / 'GT.wav', sr)
            save_audio(np.asarray(out[0]), sp / 'Reconstruction.wav', sr)
            if self.wandb:
                self.wandb.log({
                    'audio/ground_truth': self.wandb.Audio(
                        np.asarray(wav).reshape(-1), sample_rate=sr),
                    'audio/reconstruction': self.wandb.Audio(
                        np.clip(np.asarray(out[0]).reshape(-1), -1, 1),
                        sample_rate=sr)})
        except Exception as exc:
            logger.warning('reconstruction demo failed: %s', exc)

    def save(self, epoch: int, suffix: str = ''):
        if not self.is_main:
            return  # state is replicated; process 0 owns the checkpoint
        cfg = self.config
        path = (f"{cfg.checkpoint.save_location}epoch{epoch}{suffix}_"
                f"lr{cfg.optimization.lr}.ckpt")
        async_write = True
        if 'tpu' in cfg:
            async_write = bool(cfg.tpu.get('async_checkpoint', True))
        def _on_written(p, _epoch=epoch):
            # runs on the writer thread for async saves — only claim success
            # (and hand the file to wandb) once the write actually landed
            logger.info('saved checkpoint %s', p)
            if self.wandb:
                try:
                    art = self.wandb.Artifact(
                        f'checkpoint-epoch{_epoch}', type='model')
                    art.add_file(p)
                    self.wandb.log_artifact(art)
                except Exception as exc:
                    logger.warning('wandb artifact upload failed: %s', exc)

        if async_write:
            logger.info('checkpoint write scheduled: %s', path)
        save_checkpoint(path, self.state, epoch, async_write=async_write,
                        on_written=_on_written)

    def run(self):
        cfg = self.config
        start_epoch = max(1, self.resume_epoch + 1)

        # preemption safety (TPU VMs get SIGTERM on eviction; the reference
        # has no recovery story, SURVEY.md §5): checkpoint before dying
        import signal
        current_epoch = [start_epoch - 1]

        def _on_term(signum, frame):
            if self.is_main:
                logger.warning('received signal %s — writing preemption '
                               'checkpoint', signum)
            else:
                logger.warning('received signal %s — non-main process, '
                               'process 0 owns the checkpoint', signum)
            try:
                # distinct name: the live state may be MID-epoch (label =
                # completed epochs, state.step = steps taken); it must not
                # overwrite the clean boundary checkpoint of that epoch.
                # Resume from it is step-accurate: the first resumed epoch
                # skips the already-consumed batches (train_one_epoch)
                self.save(current_epoch[0], suffix='_preempt')
                wait_pending()  # the write must land before we die
            finally:
                raise SystemExit(128 + signum)

        old_handler = signal.signal(signal.SIGTERM, _on_term)
        try:
            self.test(0)
            for epoch in range(start_epoch, int(cfg.common.max_epoch) + 1):
                current_epoch[0] = epoch - 1  # completed epochs so far
                self.train_one_epoch(epoch)
                current_epoch[0] = epoch
                if epoch % int(cfg.common.test_interval) == 0:
                    self.test(epoch)
                if epoch % int(cfg.common.save_interval) == 0:
                    self.save(epoch)
        finally:
            signal.signal(signal.SIGTERM, old_handler)
            wait_pending()
            if self.writer:
                self.writer.close()
            if self.wandb:
                self.wandb.finish()
