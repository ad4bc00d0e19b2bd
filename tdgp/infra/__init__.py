from tdgp.infra.experiment import (load_config, apply_overrides, finalize_config,
                                   create_experiment_dir, save_config, config_to_dict)
