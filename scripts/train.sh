# Training with UCAS_AOD dataset
python train.py --model_name mkiou5 --config configs/hyp.yaml --data configs/UCAS_AOD.yaml --epochs 100

# Training with DOTA_v1.0 dataset
# python train.py --model_name kfiou3_DOTA --config configs/hyp.yaml --data configs/DOTA.yaml --epochs 100
