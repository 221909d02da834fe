"""sklearn shim package: mean_squared_error + MinMaxScaler only."""
