"""Top-level evaluation driver (ref OE-VAE/plots.py:13-51 ``plot_results``).

Pipeline: metric bank -> [0,1] mapping -> optional mass decorrelation ->
bump scan over cuts -> ROC suite / mass-sculpting / loss distributions ->
optional background-suppression cuts.  The reference forks one process
per stage; here the heavy math is already batched on device and the
matplotlib stages run sequentially.
"""

from .metrics import compute_metric_bank, loss_mapping
from .deco import mass_deco
from .bump import bump_scan, generate_cuts


def plot_results(y_true, x_true, x_pred, sample, n_dims, params, metrics,
                 loss_metric, sig_data, output_dir, apply_cuts="OFF",
                 normal_losses="ON", decorrelation="OFF", npe=1000,
                 mesh=None):
    print("\nPLOTTING PERFORMANCE RESULTS:")
    on = lambda flag: (flag.upper() == "ON") if isinstance(flag, str) else bool(flag)
    # decorrelation accepts the reference's full value set: 'ON' (OE-VAE
    # semantics -> 2d, ref OE-VAE/plots.py:36-39) or an explicit variant
    # 'm'/'pt'/'2d' (ref OE-AAE/utils.py:107-145 bin_deco/mass_deco).
    deco = str(decorrelation)
    deco = "2d" if deco.upper() == "ON" else deco.lower()
    deco_active = deco in ("m", "pt", "2d")
    x_losses = compute_metric_bank(x_true, x_pred, params, metrics, n_dims,
                                   sample, normal_losses=False, mesh=mesh)
    metrics = list(x_losses.keys())
    if on(normal_losses) or deco_active:
        x_losses = {key: loss_mapping(val) for key, val in x_losses.items()}
    if deco_active:
        x_losses[loss_metric] = mass_deco(y_true, sample, x_losses[loss_metric],
                                          deco=deco)
    best_loss = bump_scan(y_true, x_losses[loss_metric], loss_metric, sample,
                          sig_data, output_dir, npe=npe)
    from ..plotting.performance import roc_curves, mass_correlation, loss_distributions
    roc_curves(y_true, x_losses, sample["weights"], metrics, output_dir)
    mass_correlation(y_true, x_losses, sample["m"], sample["weights"], metrics,
                     loss_metric, output_dir)
    for metric in metrics:
        loss_distributions(y_true, x_losses[metric], sample["weights"], metric,
                           output_dir, best_loss)
    if on(apply_cuts):
        generate_cuts(y_true, sample, x_losses[loss_metric], loss_metric,
                      sig_data, output_dir)
    print()
    return best_loss, x_losses
